"""Veramo data-store ORM query surface over the credentials table.

The reference exposes ~45 agent methods over a TypeORM-backed credential
store (veramo-agent/src/constants/veramo-methods.ts:5-63); the dataStoreORM*
family is parameterized find: a list of where-conditions
({column, value[], op}), an order list, and skip/take pagination. Here that
surface is a DataFrame query translator plus contract queries:

- ``credentials_table`` derives a deterministic VC table from events
  (hash, issuer/subject DIDs, type, issuance/expiration, claim key/value) —
  the engine-side stand-in for the reference's Postgres ``credential``
  table, fully SQL-expressible so every ORM query has an exact oracle;
- ``orm_find`` translates Veramo FindArgs (Equal/In/Like/Between/LessThan/
  MoreThan/IsNull, order, skip/take) into a filter/orderBy/window plan;
- the contract queries cover the main method shapes:
  GetVerifiableCredentialsByClaims, GetVerifiableCredentialsCount,
  GetIdentifiers(+Count), and paginated GetVerifiableCredentials.

Scale notes: all predicates are Catalyst expressions (pushed to the scan);
pagination materializes only the first skip+take rows per the global sort —
a top-K, not a full sort, under Spark's TakeOrderedAndProject.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.operators.identity import SYMBOLS
from ssiintegrateddatapipeline_spark.sources.batch import load_table
from ssiintegrateddatapipeline_spark.sources.batch import local_frame

_SYMBOLS_SQL = "[" + ", ".join(f"'{s}'" for s in SYMBOLS) + "]"

# event_type -> credential type, mirroring the reference's two credential
# shapes (trade VCs + authorization VCs) with a default bucket
_TYPE_MAP = {
    "purchase": "TradeCredential",
    "signup": "AuthorizationCredential",
}
_DEFAULT_TYPE = "ActivityCredential"


def credentials_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's ``credential`` table (Veramo data-store schema subset:
    hash, issuer, subject, type, issuanceDate, expirationDate, claim)."""
    ev = load_table(spark, sf_dir, "events")
    arr = F.array(*[F.lit(s) for s in SYMBOLS])
    issuer = F.concat(
        F.lit("did:example:issuer:"),
        F.element_at(arr, (F.col("user_id") % 5 + 1).cast("int")),
    )
    cred_type = F.coalesce(
        *[
            F.when(F.col("event_type") == k, F.lit(v))
            for k, v in _TYPE_MAP.items()
        ],
        F.lit(_DEFAULT_TYPE),
    )
    return ev.select(
        F.md5(F.col("event_id").cast("string")).alias("credential_hash"),
        issuer.alias("issuer_did"),
        F.concat(F.lit("did:example:user:"), F.col("user_id")).alias(
            "subject_did"
        ),
        cred_type.alias("credential_type"),
        F.col("ts").alias("issuance_date"),
        (
            F.col("ts")
            + F.make_dt_interval(days=(F.col("user_id") % 30 + 1).cast("int"))
        ).alias("expiration_date"),
        F.lit("amount").alias("claim_type"),
        F.col("value").alias("claim_value"),
    )


_CREDENTIALS_SQL = f"""
    SELECT md5(event_id::VARCHAR) AS credential_hash,
           'did:example:issuer:' || {_SYMBOLS_SQL}[(user_id % 5 + 1)::INT]
               AS issuer_did,
           'did:example:user:' || user_id::VARCHAR AS subject_did,
           CASE event_type WHEN 'purchase' THEN 'TradeCredential'
                           WHEN 'signup' THEN 'AuthorizationCredential'
                           ELSE 'ActivityCredential' END AS credential_type,
           ts AS issuance_date,
           ts + to_days((user_id % 30 + 1)::INT) AS expiration_date,
           'amount' AS claim_type,
           value AS claim_value
    FROM events
"""


# -- FindArgs translator ----------------------------------------------------


@dataclass(frozen=True)
class Where:
    """One TypeORM-style condition: {column, value[], op} (Veramo FindArgs)."""

    column: str
    value: tuple = ()
    op: str = "Equal"

    def to_column(self) -> Column:
        c = F.col(self.column)
        op = self.op
        if op == "Equal":
            return c == F.lit(self.value[0])
        if op == "In":
            return c.isin(*self.value)
        if op == "Like":
            return c.like(self.value[0])
        if op == "Between":
            return c.between(F.lit(self.value[0]), F.lit(self.value[1]))
        if op == "LessThan":
            return c < F.lit(self.value[0])
        if op == "LessThanOrEqual":
            return c <= F.lit(self.value[0])
        if op == "MoreThan":
            return c > F.lit(self.value[0])
        if op == "MoreThanOrEqual":
            return c >= F.lit(self.value[0])
        if op == "IsNull":
            return c.isNull()
        raise ValueError(f"unsupported FindArgs op {op!r}")


@dataclass(frozen=True)
class FindArgs:
    where: tuple[Where, ...] = ()
    order: tuple[tuple[str, str], ...] = ()  # (column, 'ASC'|'DESC')
    skip: int = 0
    take: int | None = None


def orm_find(
    df: DataFrame, args: FindArgs, tiebreak: str = "credential_hash"
) -> DataFrame:
    """dataStoreORM* find semantics: AND of where conditions, multi-column
    order, skip/take pagination (ties broken by ``tiebreak`` — the store's
    unique id column — for determinism). skip+take plans as ONE
    TakeOrderedAndProject(limit=skip+take, offset=skip) — a distributed
    top-K, no global sort and no single-partition row_number window.
    skip without take is inherently unbounded ("everything past row N"):
    it plans as a distributed range-partitioned sort + offset, the best
    available shape — prefer passing take for true pagination."""
    out = df
    for w in args.where:
        out = out.where(w.to_column())
    if args.order or args.skip or args.take is not None:
        order_cols = [
            F.col(c).desc() if d.upper() == "DESC" else F.col(c).asc()
            for c, d in args.order
        ]
        order_cols.append(F.col(tiebreak).asc())
        out = out.orderBy(*order_cols)
        if args.skip:
            out = out.offset(args.skip)
        if args.take is not None:
            out = out.limit(args.take)
    return out


def orm_count(df: DataFrame, where: tuple[Where, ...] = ()) -> DataFrame:
    """dataStoreORM*Count: a single-row count under the same where set."""
    out = df
    for w in where:
        out = out.where(w.to_column())
    return out.agg(F.count("*").alias("n"))


# -- contract queries -------------------------------------------------------


def vcs_by_claims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dataStoreORMGetVerifiableCredentialsByClaims: claim-type equality +
    claim-value range, returning full credential rows."""
    creds = credentials_table(spark, sf_dir)
    found = orm_find(
        creds,
        FindArgs(
            where=(
                Where("claim_type", ("amount",), "Equal"),
                Where("claim_value", (200.0,), "MoreThan"),
                Where("credential_type", ("TradeCredential",), "Equal"),
            )
        ),
    )
    return found.select(
        "credential_hash",
        "issuer_did",
        "subject_did",
        "issuance_date",
        "claim_value",
    )


def vcs_count_by_issuer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dataStoreORMGetVerifiableCredentialsCount, per issuer and type —
    the count surface as a grouped aggregate."""
    creds = credentials_table(spark, sf_dir)
    return creds.groupBy("issuer_did", "credential_type").agg(
        F.count("*").alias("n_credentials"),
        F.countDistinct("subject_did").alias("n_subjects"),
        F.max("issuance_date").alias("latest_issuance"),
    )


def identifiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dataStoreORMGetIdentifiers(+Count): every DID seen by the store —
    issuers and subjects with role, credential count, first/last activity.

    One scan, not a union of two: each credential row explodes into its
    (issuer, 'issuer') and (subject, 'subject') pairs in-row, halving the
    table IO vs the textbook UNION ALL shape (the oracle keeps UNION ALL —
    same multiset)."""
    creds = credentials_table(spark, sf_dir)
    both = creds.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("issuer_did").alias("did"),
                    F.lit("issuer").alias("role"),
                ),
                F.struct(
                    F.col("subject_did").alias("did"),
                    F.lit("subject").alias("role"),
                ),
            )
        ).alias("e"),
        "issuance_date",
    )
    return (
        both.select("e.did", "e.role", "issuance_date")
        .groupBy("did", "role")
        .agg(
            F.count("*").alias("n_credentials"),
            F.min("issuance_date").alias("first_seen"),
            F.max("issuance_date").alias("last_seen"),
        )
    )


def vcs_paginated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dataStoreORMGetVerifiableCredentials with order + skip/take: page 3
    of TradeCredentials ordered by issuance_date desc (take=20, skip=40)."""
    creds = credentials_table(spark, sf_dir)
    return orm_find(
        creds,
        FindArgs(
            where=(Where("credential_type", ("TradeCredential",), "Equal"),),
            order=(("issuance_date", "DESC"),),
            skip=40,
            take=20,
        ),
    ).select("credential_hash", "subject_did", "issuance_date", "claim_value")


# dataStoreGetVerifiableCredential({hash: jwt}) — the dual-auth gate's
# point lookup (veramo-agent/src/app/veramo_middleware_manager.ts:189-208):
# the middleware hashes the presented JWT and fetches the stored credential
# by that hash. credential_hash here is md5(event_id), so the hash of
# event 0 is a stable literal at every scale factor.
_LOOKUP_HASH = hashlib.md5(b"0").hexdigest()


def vc_by_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: dataStoreGetVerifiableCredential — equality point lookup on the
    credential hash, returning the full stored credential row. The literal
    predicate reaches the parquet scan (PushedFilters), so at 100 TB this
    is a pruned scan + filter, not a table pass."""
    creds = credentials_table(spark, sf_dir)
    return orm_find(
        creds,
        FindArgs(where=(Where("credential_hash", (_LOOKUP_HASH,), "Equal"),)),
    )


def expiring_credentials(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Between/IsNull shapes: credentials whose validity window is
    shortest per issuer — the revocation-sweep query a store runs."""
    creds = credentials_table(spark, sf_dir)
    validity_days = (
        (
            F.unix_micros("expiration_date") - F.unix_micros("issuance_date")
        )
        / F.lit(86_400_000_000.0)
    ).alias("validity_days")
    return (
        creds.select("issuer_did", "credential_type", validity_days)
        .where(F.col("validity_days") <= 7.0)
        .groupBy("issuer_did", "credential_type")
        .agg(
            F.count("*").alias("n_expiring"),
            F.round(F.avg("validity_days"), 6).alias("avg_validity_days"),
        )
    )


def presentations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dataStoreORMGetVerifiablePresentations(+Count): a presentation is a
    holder-day bundle of credentials (the holder presents that day's VCs).
    Returns one row per presentation with the credential set profile."""
    creds = credentials_table(spark, sf_dir)
    return (
        creds.groupBy(
            F.col("subject_did").alias("holder_did"),
            F.to_date("issuance_date").alias("presentation_date"),
        )
        .agg(
            F.count("*").alias("n_credentials"),
            F.array_sort(F.collect_set("credential_type")).alias("types"),
            F.round(F.sum("claim_value"), 4).alias("total_claim_value"),
        )
        .where(F.col("n_credentials") >= 2)
    )


# event_type -> Veramo message type: the message store records the agent's
# DIDComm traffic; the engine models the three message kinds the reference's
# flows produce (SDR requests, credential offers, presentations)
_MSG_TYPE_SQL = """CASE event_type WHEN 'signup' THEN 'sdr'
                           WHEN 'purchase' THEN 'w3c.vc'
                           ELSE 'w3c.vp' END"""


def messages_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's Veramo ``message`` table (IMessage subset: id, type,
    from, to, thread, createdAt) — the store behind
    dataStoreORMGetMessages(+Count), derived deterministically from events
    the same way credentials_table derives the credential store."""
    ev = load_table(spark, sf_dir, "events")
    arr = F.array(*[F.lit(s) for s in SYMBOLS])
    return ev.select(
        F.md5(F.concat(F.lit("msg:"), F.col("event_id").cast("string"))).alias(
            "message_id"
        ),
        F.when(F.col("event_type") == "signup", F.lit("sdr"))
        .when(F.col("event_type") == "purchase", F.lit("w3c.vc"))
        .otherwise(F.lit("w3c.vp"))
        .alias("msg_type"),
        F.concat(F.lit("did:example:user:"), F.col("user_id")).alias(
            "from_did"
        ),
        F.concat(
            F.lit("did:example:issuer:"),
            F.element_at(arr, (F.col("user_id") % 5 + 1).cast("int")),
        ).alias("to_did"),
        F.concat(F.lit("thread-"), (F.col("user_id") % 50)).alias("thread_id"),
        F.col("ts").alias("created_at"),
    )


_MESSAGES_SQL = f"""
    SELECT md5('msg:' || event_id::VARCHAR) AS message_id,
           {_MSG_TYPE_SQL} AS msg_type,
           'did:example:user:' || user_id::VARCHAR AS from_did,
           'did:example:issuer:' || {_SYMBOLS_SQL}[(user_id % 5 + 1)::INT]
               AS to_did,
           'thread-' || (user_id % 50)::VARCHAR AS thread_id,
           ts AS created_at
    FROM events
"""


def messages_find(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dataStoreORMGetMessages: FindArgs over the message store — page 2
    of a thread subset's credential-bearing messages, newest first
    (where type In + thread Like, order createdAt DESC, skip/take). The
    same translator as the credential finds; only the tiebreak column
    differs (message_id is the store's unique id)."""
    msgs = messages_table(spark, sf_dir)
    return orm_find(
        msgs,
        FindArgs(
            where=(
                Where("msg_type", ("w3c.vc", "w3c.vp"), "In"),
                Where("thread_id", ("thread-1%",), "Like"),
            ),
            order=(("created_at", "DESC"),),
            skip=10,
            take=10,
        ),
        tiebreak="message_id",
    )


# The SDR spec: createSelectiveDisclosureRequest's claims array — each entry
# asks for a claim type, restricted to an issuer set and a minimum value.
# A plan-time literal (a real agent receives it in the request body).
_SDR_CLAIMS = (
    ("proof_of_trade", "TradeCredential", ("AAPL", "MSFT"), 500.0),
    ("proof_of_activity", "ActivityCredential", ("GOOG",), 800.0),
)


def sdr_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """getVerifiableCredentialsForSdr: for each claim of a selective-
    disclosure request, the matching credentials from the store (claim
    type + issuer restriction + value floor), best-first — the reference's
    SDR flow (veramo-methods.ts: createSelectiveDisclosureRequest /
    getVerifiableCredentialsForSdr) as a broadcast-spec join: the SDR is a
    k-row literal dim broadcast against the store scan, so at 100 TB the
    cost is one pruned credential scan regardless of how many claims the
    request carries. Top-5 per claim, ranked by claim_value then hash."""
    creds = credentials_table(spark, sf_dir)
    spec = local_frame(spark, 
        [
            (name, ctype, f"did:example:issuer:{sym}", floor)
            for name, ctype, syms, floor in _SDR_CLAIMS
            for sym in syms
        ],
        "sdr_claim string, credential_type string, issuer_did string,"
        " min_value double",
    )
    matched = creds.join(
        F.broadcast(spec), ["credential_type", "issuer_did"]
    ).where(F.col("claim_value") >= F.col("min_value"))
    w = Window.partitionBy("sdr_claim").orderBy(
        F.col("claim_value").desc(), F.col("credential_hash")
    )
    return (
        matched.withColumn("match_rank", F.row_number().over(w).cast("long"))
        .where(F.col("match_rank") <= 5)
        .select(
            "sdr_claim",
            "match_rank",
            "credential_hash",
            "issuer_did",
            "subject_did",
            "claim_value",
        )
    )


def sdr_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """validatePresentationAgainstSdr: grade each presentation (the
    holder-day credential bundles of `credstore_presentations`'s
    definition, un-thresholded) against the SDR — a presentation
    satisfies a claim if it contains at least one credential matching
    that claim's (type, issuer, floor) spec, and is VALID iff every SDR
    claim is satisfied. Shape: the per-credential spec match of
    `credstore_sdr_match` aggregated twice — distinct claims satisfied
    per presentation, compared against the request's claim count (a
    broadcast 1-row literal). Only presentations satisfying >= 1 claim
    are returned (the validator is called per presented bundle; bundles
    matching nothing are the uninteresting complement)."""
    creds = credentials_table(spark, sf_dir)
    spec = local_frame(spark, 
        [
            (name, ctype, f"did:example:issuer:{sym}", floor)
            for name, ctype, syms, floor in _SDR_CLAIMS
            for sym in syms
        ],
        "sdr_claim string, credential_type string, issuer_did string,"
        " min_value double",
    )
    n_claims = len(_SDR_CLAIMS)
    matched = creds.join(
        F.broadcast(spec), ["credential_type", "issuer_did"]
    ).where(F.col("claim_value") >= F.col("min_value"))
    per_pres = matched.groupBy(
        F.col("subject_did").alias("holder_did"),
        F.to_date("issuance_date").alias("presentation_date"),
    ).agg(
        F.countDistinct("sdr_claim").alias("claims_satisfied"),
        F.count(F.lit(1)).alias("n_matching_credentials"),
    )
    return per_pres.select(
        "holder_did",
        "presentation_date",
        "claims_satisfied",
        "n_matching_credentials",
        (F.col("claims_satisfied") == n_claims).alias("sdr_valid"),
    )


# ---------------------------------------------------------------------------
# DID/key store mutations (veramo-methods.ts:8-11,27-32):
# didManagerImport/Delete/AddKey/RemoveKey/AddService/RemoveService plus
# keyManagerCreate/Delete/Import as rows of one mutation log, applied
# INCREMENTALLY (base fold + change feed, the scd2_apply_changes device)
# and proven equal to a full rebuild by the oracle.
# ---------------------------------------------------------------------------

# event_type -> mutation op; every 101st event is a didManagerDelete
# regardless of type (deletes must interleave with adds for the fold to
# be non-trivial). keyManagerCreate/Import are the addKey rows seen from
# the key-store side; keyManagerDelete is removeKey.
_MUT_OP_SQL = """CASE WHEN event_id % 101 = 0 THEN 'delete'
         WHEN event_type = 'signup' THEN 'import'
         WHEN event_type = 'purchase' THEN 'addKey'
         WHEN event_type = 'click' THEN 'addService'
         WHEN event_type = 'error' THEN 'removeKey'
         ELSE 'removeService' END"""


def _mutation_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the deterministic mutation stream from events: one mutation
    per event, ordered by the globally unique event_id (the log's seq)."""
    return mutations_from(load_table(spark, sf_dir, "events"))


def mutations_from(ev: DataFrame) -> DataFrame:
    """The mutation-log projection as pure column logic — shared by the
    batch fold and the streaming twin (streaming/pipeline.py applies the
    same log online, so both sides replay ONE derivation)."""
    op = (
        F.when(F.col("event_id") % 101 == 0, F.lit("delete"))
        .when(F.col("event_type") == "signup", F.lit("import"))
        .when(F.col("event_type") == "purchase", F.lit("addKey"))
        .when(F.col("event_type") == "click", F.lit("addService"))
        .when(F.col("event_type") == "error", F.lit("removeKey"))
        .otherwise(F.lit("removeService"))
    )
    item_type = (
        F.when(op.isin("addKey", "removeKey"), F.lit("key"))
        .when(op.isin("addService", "removeService"), F.lit("svc"))
    )
    item_id = (
        F.when(
            op.isin("addKey", "removeKey"),
            F.concat(F.lit("key-"), (F.col("event_id") % 7)),
        )
        .when(
            op.isin("addService", "removeService"),
            F.concat(F.lit("svc-"), (F.col("event_id") % 5)),
        )
    )
    return ev.select(
        F.concat(F.lit("did:example:user:"), F.col("user_id")).alias("did"),
        F.col("event_id").alias("seq"),
        op.alias("op"),
        item_type.alias("item_type"),
        item_id.alias("item_id"),
    )


def _fold_mutations(muts: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The store fold: collapse a mutation stream to (barriers, items).

    Semantics (Veramo's identifier lifecycle): import creates/resets the
    identifier (seeding its initial key-0 — createIdentifier always mints
    one key); delete removes it and everything under it; add/remove
    key/service mutate the LIVE identifier — ops on a never-imported or
    deleted identifier are ignored (the agent would throw; the log-apply
    skips). 'import_noseed' is the synthetic barrier the incremental
    path re-injects for base state — a barrier that must NOT re-seed
    key-0 (the base items already carry the truth).

    barriers: (did, barrier_seq, last_barrier_op) — one row per did that
    ever saw a barrier. items: (did, item_type, item_id, last_seq) —
    present items of EXISTING dids only."""
    barrier_ops = ("import", "import_noseed", "delete")
    barriers = (
        muts.where(F.col("op").isin(*barrier_ops))
        .groupBy("did")
        .agg(
            F.max("seq").alias("barrier_seq"),
            F.max_by("op", "seq").alias("last_barrier_op"),
        )
    )
    seeded = muts.where(F.col("op") == "import").select(
        "did",
        "seq",
        F.lit("addKey").alias("op"),
        F.lit("key").alias("item_type"),
        F.lit("key-0").alias("item_id"),
    )
    item_ops = muts.where(
        F.col("op").isin("addKey", "removeKey", "addService", "removeService")
    ).select("did", "seq", "op", "item_type", "item_id").unionByName(seeded)
    live = barriers.where(
        F.col("last_barrier_op").isin("import", "import_noseed")
    )
    items = (
        item_ops.join(live, "did")
        .where(F.col("seq") >= F.col("barrier_seq"))
        .groupBy("did", "item_type", "item_id")
        .agg(
            F.max_by("op", "seq").alias("last_op"),
            F.max("seq").alias("last_seq"),
        )
        .where(F.col("last_op").startswith("add"))
        .drop("last_op")
    )
    return barriers, items


def apply_mutations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """didManager/keyManager store mutations as engine semantics: the
    mutation log folds to per-DID store state — INCREMENTALLY. The state
    built from the first ~60% of the log (by seq) is the installed base;
    the tail is the change feed. Only dids touched by the feed re-fold
    (their base state re-enters the fold as synthetic mutations at their
    original seqs — the scd2_apply_changes open-row device); untouched
    dids pass through verbatim via an anti join.

    The oracle is the FULL-REBUILD SQL over the whole log, so the hash
    compare proves apply ≡ rebuild — the MERGE-correctness property a
    store sink must guarantee.

    Scale shape: both folds are hash aggregations keyed by (did[, item]);
    the cutoff is one bounded 1-row aggregate; no windows, no collects of
    data rows. At 100 TB the feed is small next to the base, and the
    anti/semi joins ship only dids.

    Round 12 (§2.4 — two operations keyed the same way share one
    exchange): the log hash-partitions by ``did`` ONCE, right after the
    projection; every fold/aggregate downstream keys on did or a
    superset (HashPartitioning(did) satisfies their clustered
    distributions), so the base folds, the affected-did distinct and the
    final per-did aggregates all read the SAME reused exchange instead
    of each shuffling its own filtered subset — the r9-audited
    14-broadcast-join lattice is unchanged, only its ~6 aggregation
    exchanges over events-derived rows collapse to 1 (+ the small
    merged-fold exchanges above the unions, whose inputs are feed-sized).
    The cut scalar stays on the RAW projection so the build-time collect
    never pays the shuffle. Measured (interleaved A/B, sf0.1): exec
    2.9 -> 2.0 s, frame-equal."""
    muts_raw = _mutation_log(spark, sf_dir)
    cut = int(
        muts_raw.agg((F.max("seq") * 3 / 5).cast("long")).collect()[0][0]
    )  # bounded: single scalar, the two-phase-device precedent
    muts = muts_raw.repartition(F.col("did"))
    base_b, base_i = _fold_mutations(muts.where(F.col("seq") < cut))
    delta = muts.where(F.col("seq") >= cut)
    affected = delta.select("did").distinct()

    unt_b = base_b.join(affected, "did", "left_anti")
    unt_i = base_i.join(affected, "did", "left_anti")

    syn_barriers = base_b.join(affected, "did", "left_semi").select(
        "did",
        F.col("barrier_seq").alias("seq"),
        F.when(F.col("last_barrier_op") == "delete", F.lit("delete"))
        .otherwise(F.lit("import_noseed"))
        .alias("op"),
        F.lit(None).cast("string").alias("item_type"),
        F.lit(None).cast("string").alias("item_id"),
    )
    syn_items = base_i.join(affected, "did", "left_semi").select(
        "did",
        F.col("last_seq").alias("seq"),
        F.when(F.col("item_type") == "key", F.lit("addKey"))
        .otherwise(F.lit("addService"))
        .alias("op"),
        "item_type",
        "item_id",
    )
    merged_b, merged_i = _fold_mutations(
        syn_barriers.unionByName(syn_items).unionByName(delta)
    )

    barriers = unt_b.unionByName(merged_b)
    items = unt_i.unionByName(merged_i)

    dids = muts.groupBy("did").agg(F.max("seq").alias("last_mutation_seq"))
    exists = F.coalesce(
        F.col("last_barrier_op").isin("import", "import_noseed"), F.lit(False)
    )
    per_item = items.groupBy("did").agg(
        F.sum((F.col("item_type") == "key").cast("int")).alias("n_keys"),
        F.sum((F.col("item_type") == "svc").cast("int")).alias("n_services"),
        F.concat_ws(
            ",",
            F.array_sort(
                F.collect_list(
                    F.when(F.col("item_type") == "key", F.col("item_id"))
                )
            ),
        ).alias("keys_fp"),
        F.concat_ws(
            ",",
            F.array_sort(
                F.collect_list(
                    F.when(F.col("item_type") == "svc", F.col("item_id"))
                )
            ),
        ).alias("services_fp"),
    )
    return (
        dids.join(barriers, "did", "left")
        .join(per_item, "did", "left")
        .select(
            "did",
            exists.alias("did_exists"),
            F.coalesce("n_keys", F.lit(0)).alias("n_keys"),
            F.coalesce("n_services", F.lit(0)).alias("n_services"),
            F.coalesce("keys_fp", F.lit("")).alias("keys_fp"),
            F.coalesce("services_fp", F.lit("")).alias("services_fp"),
            "last_mutation_seq",
        )
    )


QUERIES = {
    "credstore_apply_mutations": apply_mutations,
    "credstore_messages": messages_find,
    "credstore_sdr_match": sdr_matches,
    "credstore_sdr_validate": sdr_validate,
    "credstore_vcs_by_claims": vcs_by_claims,
    "credstore_count_by_issuer": vcs_count_by_issuer,
    "credstore_identifiers": identifiers,
    "credstore_paginated": vcs_paginated,
    "credstore_vc_by_hash": vc_by_hash,
    "credstore_expiring": expiring_credentials,
    "credstore_presentations": presentations,
}

_SDR_SPEC_VALUES = ", ".join(
    f"('{name}', '{ctype}', 'did:example:issuer:{sym}', {floor})"
    for name, ctype, syms, floor in _SDR_CLAIMS
    for sym in syms
)

ORACLES = {
    # apply_mutations: the oracle is the FULL REBUILD over the whole
    # mutation log — the engine applies base + change feed incrementally,
    # so a hash match here proves apply ≡ rebuild.
    "credstore_apply_mutations": f"""
        WITH muts AS (
            SELECT 'did:example:user:' || user_id::VARCHAR AS did,
                   event_id AS seq,
                   {_MUT_OP_SQL} AS op,
                   CASE WHEN event_id % 101 = 0 THEN NULL
                        WHEN event_type IN ('purchase', 'error') THEN 'key'
                        WHEN event_type IN ('click', 'view') THEN 'svc'
                   END AS item_type,
                   CASE WHEN event_id % 101 = 0 THEN NULL
                        WHEN event_type IN ('purchase', 'error')
                            THEN 'key-' || (event_id % 7)::VARCHAR
                        WHEN event_type IN ('click', 'view')
                            THEN 'svc-' || (event_id % 5)::VARCHAR
                   END AS item_id
            FROM events
        ),
        barriers AS (
            SELECT did, max(seq) AS barrier_seq,
                   arg_max(op, seq) AS last_barrier_op
            FROM muts WHERE op IN ('import', 'delete') GROUP BY did
        ),
        item_ops AS (
            SELECT did, seq, op, item_type, item_id FROM muts
            WHERE op IN ('addKey', 'removeKey', 'addService', 'removeService')
            UNION ALL
            SELECT did, seq, 'addKey', 'key', 'key-0' FROM muts
            WHERE op = 'import'
        ),
        state AS (
            SELECT i.did, i.item_type, i.item_id
            FROM item_ops i JOIN barriers b ON i.did = b.did
            WHERE b.last_barrier_op = 'import' AND i.seq >= b.barrier_seq
            GROUP BY 1, 2, 3
            HAVING arg_max(i.op, i.seq) LIKE 'add%'
        ),
        per_item AS (
            SELECT did,
                   count(*) FILTER (item_type = 'key') AS n_keys,
                   count(*) FILTER (item_type = 'svc') AS n_services,
                   coalesce(string_agg(item_id, ',' ORDER BY item_id)
                            FILTER (item_type = 'key'), '') AS keys_fp,
                   coalesce(string_agg(item_id, ',' ORDER BY item_id)
                            FILTER (item_type = 'svc'), '') AS services_fp
            FROM state GROUP BY did
        ),
        dids AS (
            SELECT did, max(seq) AS last_mutation_seq FROM muts GROUP BY did
        )
        SELECT d.did,
               coalesce(b.last_barrier_op = 'import', FALSE) AS did_exists,
               coalesce(p.n_keys, 0)::BIGINT AS n_keys,
               coalesce(p.n_services, 0)::BIGINT AS n_services,
               coalesce(p.keys_fp, '') AS keys_fp,
               coalesce(p.services_fp, '') AS services_fp,
               d.last_mutation_seq
        FROM dids d
        LEFT JOIN barriers b USING (did)
        LEFT JOIN per_item p USING (did)
    """,
    "credstore_messages": f"""
        WITH msgs AS ({_MESSAGES_SQL}),
        ranked AS (
            SELECT *, row_number() OVER (
                       ORDER BY created_at DESC, message_id ASC
                   ) AS rn
            FROM msgs
            WHERE msg_type IN ('w3c.vc', 'w3c.vp')
              AND thread_id LIKE 'thread-1%'
        )
        SELECT message_id, msg_type, from_did, to_did, thread_id, created_at
        FROM ranked WHERE rn > 10 AND rn <= 20
    """,
    "credstore_sdr_match": f"""
        WITH creds AS ({_CREDENTIALS_SQL}),
        spec(sdr_claim, credential_type, issuer_did, min_value)
            AS (VALUES {_SDR_SPEC_VALUES}),
        matched AS (
            SELECT s.sdr_claim, c.credential_hash, c.issuer_did,
                   c.subject_did, c.claim_value,
                   row_number() OVER (
                       PARTITION BY s.sdr_claim
                       ORDER BY c.claim_value DESC, c.credential_hash
                   ) AS match_rank
            FROM creds c
            JOIN spec s ON c.credential_type = s.credential_type
                       AND c.issuer_did = s.issuer_did
            WHERE c.claim_value >= s.min_value
        )
        SELECT sdr_claim, match_rank, credential_hash, issuer_did,
               subject_did, claim_value
        FROM matched WHERE match_rank <= 5
    """,
    "credstore_sdr_validate": f"""
        WITH creds AS ({_CREDENTIALS_SQL}),
        spec(sdr_claim, credential_type, issuer_did, min_value)
            AS (VALUES {_SDR_SPEC_VALUES}),
        matched AS (
            SELECT s.sdr_claim, c.subject_did, c.issuance_date
            FROM creds c
            JOIN spec s ON c.credential_type = s.credential_type
                       AND c.issuer_did = s.issuer_did
            WHERE c.claim_value >= s.min_value
        )
        SELECT subject_did AS holder_did,
               issuance_date::DATE AS presentation_date,
               count(DISTINCT sdr_claim) AS claims_satisfied,
               count(*) AS n_matching_credentials,
               count(DISTINCT sdr_claim) = {len(_SDR_CLAIMS)} AS sdr_valid
        FROM matched
        GROUP BY 1, 2
    """,
    "credstore_vcs_by_claims": f"""
        WITH creds AS ({_CREDENTIALS_SQL})
        SELECT credential_hash, issuer_did, subject_did, issuance_date,
               claim_value
        FROM creds
        WHERE claim_type = 'amount' AND claim_value > 200.0
          AND credential_type = 'TradeCredential'
    """,
    "credstore_count_by_issuer": f"""
        WITH creds AS ({_CREDENTIALS_SQL})
        SELECT issuer_did, credential_type,
               count(*) AS n_credentials,
               count(DISTINCT subject_did) AS n_subjects,
               max(issuance_date) AS latest_issuance
        FROM creds
        GROUP BY issuer_did, credential_type
    """,
    "credstore_identifiers": f"""
        WITH creds AS ({_CREDENTIALS_SQL}),
        both_roles AS (
            SELECT issuer_did AS did, 'issuer' AS role, issuance_date
            FROM creds
            UNION ALL
            SELECT subject_did, 'subject', issuance_date FROM creds
        )
        SELECT did, role, count(*) AS n_credentials,
               min(issuance_date) AS first_seen,
               max(issuance_date) AS last_seen
        FROM both_roles
        GROUP BY did, role
    """,
    "credstore_vc_by_hash": f"""
        WITH creds AS ({_CREDENTIALS_SQL})
        SELECT * FROM creds WHERE credential_hash = '{_LOOKUP_HASH}'
    """,
    "credstore_paginated": f"""
        WITH creds AS ({_CREDENTIALS_SQL}),
        ranked AS (
            SELECT credential_hash, subject_did, issuance_date, claim_value,
                   row_number() OVER (
                       ORDER BY issuance_date DESC, credential_hash ASC
                   ) AS rn
            FROM creds
            WHERE credential_type = 'TradeCredential'
        )
        SELECT credential_hash, subject_did, issuance_date, claim_value
        FROM ranked WHERE rn > 40 AND rn <= 60
    """,
    "credstore_presentations": f"""
        WITH creds AS ({_CREDENTIALS_SQL})
        SELECT subject_did AS holder_did,
               issuance_date::DATE AS presentation_date,
               count(*) AS n_credentials,
               list_sort(list_distinct(list(credential_type))) AS types,
               round(sum(claim_value), 4) AS total_claim_value
        FROM creds
        GROUP BY 1, 2
        HAVING count(*) >= 2
    """,
    "credstore_expiring": f"""
        WITH creds AS ({_CREDENTIALS_SQL})
        SELECT issuer_did, credential_type,
               count(*) AS n_expiring,
               round(avg((epoch_us(expiration_date) - epoch_us(issuance_date))
                         / 86400000000.0), 6) AS avg_validity_days
        FROM creds
        WHERE (epoch_us(expiration_date) - epoch_us(issuance_date))
              / 86400000000.0 <= 7.0
        GROUP BY issuer_did, credential_type
    """,
}
