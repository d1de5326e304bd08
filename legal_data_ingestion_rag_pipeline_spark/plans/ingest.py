"""Docket ingest pipeline — the reference's row-at-a-time loop
(ingest.py:676-798) re-expressed as one set-at-a-time Spark job DAG.

Validation parity (first failure wins, matching process_docket's
statement order, ingest.py:582-674):

1. case_number null            -> UNKNOWN   (NoneType .strip crash)
2. case_number blank           -> MISSING_CASE_NUMBER
3. filed_date unparseable/null -> BAD_DATE
4. court null or ''            -> FK_COURT
5. status null                 -> UNKNOWN   (NoneType .lower crash)
6. lower(status) not in enum   -> STATUS_UNMAPPED

Side-effect parity: court/judge/case_type dims (and their name
variations) grow from every row that passes checks 1-4 — including
rows that subsequently fail status validation, because the reference
creates entities before validating status.  Party dims grow only from
fully-good rows.

Counting parity: inserted = case_numbers new to the target seen for
the first time; every other good row (intra-file duplicate or existing
key) counts as updated; re-ingesting a file yields inserted=0.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.dates import parse_date_multi
from ..functions.hashing import canonical_record_hash
from ..functions.normalize import (
    VALID_STATUSES,
    normalize_case_type,
    normalize_court,
    normalize_judge,
    normalize_party,
)
from ..functions.parties import explode_parties, parties_struct
from ..operators.surrogate import assign_ids, assign_ids_ranged
from ..sources.readers import RAW_FIELDS


@dataclass
class IngestResult:
    run_id: int
    counts: dict[str, int]
    tables: dict[str, DataFrame] = field(default_factory=dict)
    quarantine: DataFrame | None = None
    errors: DataFrame | None = None
    cached: list[DataFrame] = field(default_factory=list)

    def release(self) -> None:
        """Unpersist the batch's intermediate caches.  Call AFTER the
        result tables are materialized (written/collected) — they
        derive from these caches, so releasing earlier recomputes the
        whole validation pipeline on next touch.  A long-lived session
        (bench, streaming foreachBatch) that skips this accumulates
        one cached validation pass per batch in executor memory."""
        for df in self.cached:
            df.unpersist()
        self.cached.clear()


def _empty_dim(spark: SparkSession, extra: str = "") -> DataFrame:
    schema = "id long, name string, normalized_name string" + extra
    return spark.createDataFrame([], schema)


def validate(raw: DataFrame) -> DataFrame:
    """Attach normalized columns + error_code/error_why (null = good)."""
    df = raw.withColumn("record_hash", canonical_record_hash(list(RAW_FIELDS)))
    df = (
        df.withColumn("parsed_date", parse_date_multi("filed_date"))
        .withColumn("norm_court", normalize_court("court"))
        .withColumn("norm_judge", normalize_judge("judge"))
        .withColumn("norm_type", normalize_case_type("case_type"))
        .withColumn("lower_status", F.lower("status"))
    )
    cn = F.col("case_number")
    status_ok = F.col("lower_status").isin(*VALID_STATUSES)
    error = (
        F.when(cn.isNull(), F.struct(F.lit("UNKNOWN").alias("code"),
               F.lit("'NoneType' object has no attribute 'strip'").alias("why")))
        .when(F.trim(cn) == "", F.struct(F.lit("MISSING_CASE_NUMBER").alias("code"),
              F.lit("case_number is required and cannot be empty").alias("why")))
        .when(F.col("parsed_date").isNull(), F.struct(F.lit("BAD_DATE").alias("code"),
              F.concat(F.lit("filed_date parse failed: "),
                       F.coalesce(F.col("filed_date"), F.lit("None"))).alias("why")))
        .when(F.col("court").isNull() | (F.col("court") == ""),
              F.struct(F.lit("FK_COURT").alias("code"),
                       F.lit("Court name cannot be empty").alias("why")))
        # present-but-empty case_type is a hard error in the reference
        # (ingest.py:506-507 raises before any insert; the message has no
        # classifier keyword, so _determine_error_code:826 yields
        # VALIDATION_ERROR).  A JSON null is indistinguishable from a
        # missing key after spark.read.json, so null keeps the reference's
        # missing-key default 'civil' (ingest.py:604) — the one residual
        # ambiguity, by design.
        .when(F.col("case_type") == "",
              F.struct(F.lit("VALIDATION_ERROR").alias("code"),
                       F.lit("Case type cannot be empty").alias("why")))
        .when(F.col("status").isNull(), F.struct(F.lit("UNKNOWN").alias("code"),
              F.lit("'NoneType' object has no attribute 'lower'").alias("why")))
        .when(~status_ok, F.struct(F.lit("STATUS_UNMAPPED").alias("code"),
              F.concat(F.lit("Invalid status '"), F.col("lower_status"),
                       F.lit("'. Must be one of: active, closed, pending, dismissed")).alias("why")))
    )
    return df.withColumn("error_code", error["code"]).withColumn("error_why", error["why"])


def _upsert_dim(
    existing: DataFrame | None,
    batch: DataFrame,
    spark: SparkSession,
    name_expr: str = "name",
    max_id: int | None = None,
) -> DataFrame:
    """Get-or-create: new normalized names get ids in first-seen order
    (min _seq), appended after the existing max id (SURVEY S4/§4#1).

    ``max_id``: the existing dim's max id when the caller already knows
    it (ingest_batch's fused stats job computes every dim's max in one
    driver round-trip); None falls back to a per-dim collect."""
    firsts = (
        batch.groupBy("normalized_name")
        .agg(F.min("_seq").alias("_first_seq"), F.min_by(name_expr, "_seq").alias("name"))
    )
    if existing is None:
        # first batch: no prior dim, so no anti-join and no max-id job
        # (the collect on an empty frame still costs a full Spark job —
        # measured as 4 avoidable driver round-trips per cold ingest)
        existing = _empty_dim(spark)
        new = firsts
        max_id = 0
    else:
        new = firsts.join(
            existing.select("normalized_name"), "normalized_name", "left_anti"
        )
        if max_id is None:
            max_id = (existing.agg(F.max("id")).collect()[0][0]) or 0
    assigned = assign_ids(new, "_first_seq", start_at=max_id + 1).select(
        "id", "name", "normalized_name"
    )
    return existing.select("id", "name", "normalized_name").unionByName(assigned)


def _variations(batch: DataFrame, dim: DataFrame, raw_col: str, ts: F.Column) -> DataFrame:
    """(entity_id, raw_name) seen stats for this batch (SURVEY S5/A11)."""
    return (
        batch.join(dim, "normalized_name")
        .groupBy(F.col("id").alias("entity_id"), F.col(raw_col).alias("raw_name"))
        .agg(
            F.count("*").alias("seen_count"),
            F.min(ts).alias("first_seen_at"),
            F.max(ts).alias("last_seen_at"),
        )
    )


def ingest_batch(
    spark: SparkSession,
    raw: DataFrame,
    existing: dict[str, DataFrame] | None = None,
    run_id: int = 1,
    known_max_ids: dict[str, int] | None = None,
) -> IngestResult:
    """One batch through the full pipeline; returns new table versions
    plus reference-parity counters.  `existing` carries prior versions
    of cases/courts/judges/case_types/parties (re-runs are idempotent:
    ids never churn, second ingest of the same file counts all-updated).

    ``known_max_ids``: table -> max existing id, when the caller
    already holds it (a tlog warehouse replays per-file [min, max]
    stats from ONE manifest read — TlogStore.stat_max — so the max-id
    aggregate legs of the fused stats job disappear entirely; parquet
    int64 footer stats are exact).  Tables absent from the dict fall
    back to the in-job aggregate.
    """
    existing = existing or {}
    known_max_ids = known_max_ids or {}
    now = F.current_timestamp()
    validated = validate(raw).cache()

    bad = validated.filter(F.col("error_code").isNotNull())
    good = validated.filter(F.col("error_code").isNull())

    # --- dim source rows: pass checks 1-4 (court resolved), any status —
    # the reference creates entities before validating status, so rows
    # that later fail STATUS_UNMAPPED/UNKNOWN(status) still grow dims.
    passes_1_4 = (
        F.col("case_number").isNotNull()
        & (F.trim("case_number") != "")
        & F.col("parsed_date").isNotNull()
        & F.col("court").isNotNull()
        & (F.col("court") != "")
    )
    dim_src = validated.filter(passes_1_4).cache()
    judges_src = dim_src.filter(
        F.col("judge").isNotNull() & (F.col("judge") != "") & (F.col("norm_judge") != "")
    )

    # --- cases: last-writer-wins per case_number by file order ---------
    # cached: the fused stats job's n_inserted / n_no_parties legs
    # compute this window anyway, which fills the cache; the cases
    # table's write then reuses it instead of re-running the window
    w = Window.partitionBy("case_number").orderBy(F.desc("_seq"))
    # r14: min(_seq) rides the SAME case_number exchange as the
    # last-writer window (unordered frame = whole partition), so
    # first_seen — previously its own groupBy re-scan of `good`,
    # recomputed by every consumer (the bucket stats leg, the ranged
    # anti-join, assign_ids_ranged) — becomes a projection of the
    # CACHED final_rows (guide §2.4: operations keyed the same way
    # share one exchange).  One row per case_number either way;
    # min(_seq) over the partition is exactly the old aggregate.
    # _has_p also rides that exchange: a row yields parties iff
    # parties_struct (the same grammar explode_parties runs, as one
    # Column — golden-pinned in tests/test_parties.py) is non-empty,
    # so max over the partition == "some good row of this case has
    # parties" == "case_number present in exploded" — the
    # n_no_parties anti-join leg becomes a predicate on the cache
    w_all = Window.partitionBy("case_number")
    final_rows = (
        good.withColumn("_rn", F.row_number().over(w))
        .withColumn("_first_seq", F.min("_seq").over(w_all))
        .withColumn(
            "_has_p",
            F.max(
                F.when(F.size(parties_struct("parties")) > 0, 1).otherwise(0)
            ).over(w_all),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    ).cache()
    existing_cases = existing.get("cases")
    if existing_cases is not None:
        keyed_existing = existing_cases.select("id", "case_number")
    first_seen = final_rows.select("case_number", "_first_seq")
    ranged_input = (
        first_seen.join(keyed_existing.select("case_number"), "case_number", "left_anti")
        if existing_cases is not None
        else first_seen
    )
    exploded = explode_parties(good.select("case_number", "parties", "_seq"))
    # cached for the same reason as final_rows: the stats job's
    # n_no_parties leg fills it; the parties/case_parties writes reuse
    exploded = exploded.withColumn(
        "norm_party", normalize_party("party_name")
    ).cache()

    # --- TWO stats jobs: cache-fill count, then ONE fused job ----------
    # Every scalar the batch needs (read/good counts, per-dim max ids,
    # n_inserted, n_no_parties, the ranged assigner's per-bucket counts)
    # is an independent tiny aggregate; issuing them sequentially cost
    # up to 9 driver round-trips per batch (each its own Spark job).
    # Union the tagged aggregates and collect ONCE (guide §1.2 "remove
    # passes", §2.6 "overlap independent work" — here via one action
    # rather than threads).  Results are bit-identical: each leg is the
    # same aggregate the sequential code ran.
    #
    # The input-side scalars run FIRST, alone, because that job is what
    # populates the `validated` cache: the fused job's legs all read
    # `validated` through independent concurrent stages, and an
    # unpopulated cache makes each leg recompute the JSON validation
    # base (cache writes race, last wins — measured +33% task time on
    # ingest_timetravel_cases when everything was one job).  One extra
    # ~50 ms round-trip buys single-computation of the expensive base;
    # 2 jobs total where the sequential code paid up to 9.  count(*)
    # and the good-row count are partial aggregates of the SAME scan,
    # so the cache-fill job returns both — the separate "good" leg the
    # fused job used to carry was a second full pass over the cache.
    _first = validated.agg(
        F.count("*").cast("long").alias("_total"),
        F.count(F.when(F.col("error_code").isNull(), 1)).cast("long").alias("_good"),
    ).collect()[0]
    total_read = int(_first["_total"])
    n_good = int(_first["_good"])
    _BW = 1 << 20  # keep in sync with assign_ids_ranged's bucket_width

    def _scalar(df: DataFrame, tag: str, agg: F.Column) -> DataFrame:
        return df.agg(agg.cast("long").alias("v")).select(
            F.lit(tag).alias("tag"), F.lit(0).cast("long").alias("k"), "v"
        )

    # ONE aggregation leg answers n_inserted, n_no_parties AND the
    # ranged assigner's bucket counts (r14): every one is a per-row
    # predicate/bucket over the SAME final_rows frame — a new
    # case_number is exactly a ranged-input row, so n_inserted IS the
    # sum of the per-bucket new-key counts, and n_no_parties reads the
    # window-borne _has_p column.  The old three legs (anti-join count
    # + exploded-distinct join + bucket groupBy) raced final_rows'
    # unpopulated cache through concurrent stages; a single leg fills
    # it once (the r13 multi-leg rule satisfied by construction).  The
    # _e left join is against keys unique on case_number, so no row
    # fans out and count(_e IS NULL) is bit-identical to the anti-join
    # count; zero-new buckets are dropped driver-side to match
    # ranged_input.groupBy().count() exactly.
    _marks = final_rows.select("case_number", "_first_seq", "_has_p")
    if existing_cases is not None:
        _marks = _marks.join(
            keyed_existing.select("case_number").withColumn("_e", F.lit(1)),
            "case_number",
            "left",
        )
    else:
        _marks = _marks.withColumn("_e", F.lit(None).cast("int"))
    bucket_np = (
        _marks.groupBy(
            F.expr(f"CAST(_first_seq AS BIGINT) DIV {_BW}").alias("k")
        )
        .agg(
            F.count(F.when(F.col("_e").isNull(), 1)).cast("long").alias("_new"),
            F.count(F.when(F.col("_has_p") == 0, 1)).cast("long").alias("_np"),
        )
        .select(
            F.expr("stack(2, 'bucket', k, _new, 'np', k, _np) AS (tag, k, v)")
        )
        .select("tag", F.col("k").cast("long").alias("k"), F.col("v").cast("long").alias("v"))
    )

    stat_parts = [bucket_np]
    stats_known: dict[str, int] = {}
    for tag, tbl in (
        ("max_courts", "courts"),
        ("max_judges", "judges"),
        ("max_case_types", "case_types"),
        ("max_parties", "parties"),
        ("max_cases", "cases"),
    ):
        prior = existing.get(tbl)
        if prior is None:
            continue
        if known_max_ids.get(tbl) is not None:
            stats_known[tag] = int(known_max_ids[tbl])
        else:
            stat_parts.append(_scalar(prior, tag, F.max("id")))
    fused = stat_parts[0]
    for part in stat_parts[1:]:
        fused = fused.unionByName(part)
    stats: dict[str, int] = dict(stats_known)
    bucket_counts: list[tuple[int, int]] = []
    n_inserted = 0
    n_no_parties = 0
    for r in fused.collect():
        if r.tag == "bucket":
            n_inserted += int(r.v)
            if r.v:  # zero-new buckets never appear in ranged_input
                bucket_counts.append((int(r.k), int(r.v)))
        elif r.tag == "np":
            n_no_parties += int(r.v)
        else:
            stats[r.tag] = int(r.v) if r.v is not None else 0
    n_updated = n_good - n_inserted

    courts = _upsert_dim(
        existing.get("courts"),
        dim_src.select(F.col("court").alias("name"), F.col("norm_court").alias("normalized_name"), "_seq"),
        spark,
        max_id=stats.get("max_courts"),
    ).cache()
    judges = _upsert_dim(
        existing.get("judges"),
        judges_src.select(F.col("judge").alias("name"), F.col("norm_judge").alias("normalized_name"), "_seq"),
        spark,
        max_id=stats.get("max_judges"),
    ).cache()
    case_types = _upsert_dim(
        existing.get("case_types"),
        dim_src.select(F.col("case_type").alias("name"), F.col("norm_type").alias("normalized_name"), "_seq"),
        spark,
        max_id=stats.get("max_case_types"),
    ).cache()

    court_vars = _variations(
        dim_src.select(F.col("norm_court").alias("normalized_name"), F.col("court")).withColumn("_ts", now),
        courts, "court", F.col("_ts"),
    )
    judge_vars = _variations(
        judges_src.select(F.col("norm_judge").alias("normalized_name"), F.col("judge")).withColumn("_ts", now),
        judges, "judge", F.col("_ts"),
    )

    # deterministic case ids: existing keep theirs; new ids by first-seen.
    # Cases are FACT-scale, so the ranged assigner (per-bucket windows +
    # cumulative offsets) replaces the global single-partition window —
    # same ids, no one-task sort at 100x data (surrogate.py recipe).
    # The per-bucket counts come from the fused stats job above.
    if existing_cases is not None:
        new_ids = assign_ids_ranged(
            ranged_input,
            "_first_seq",
            start_at=stats.get("max_cases", 0) + 1,
            bucket_counts=bucket_counts,
        ).select("id", "case_number")
        case_ids = keyed_existing.unionByName(new_ids)
    else:
        case_ids = assign_ids_ranged(
            first_seen, "_first_seq", bucket_counts=bucket_counts
        ).select("id", "case_number")
    # dims and case_ids are read by 2-3 of the concurrently-committed
    # tables each (dim table + variations + cases/case_parties);
    # caching them turns those repeats into one computation apiece
    # (dictionary-sized frames — negligible storage)
    case_ids = case_ids.cache()

    cases = (
        final_rows.join(case_ids, "case_number")
        .join(F.broadcast(courts.select(F.col("id").alias("court_id"), F.col("normalized_name").alias("norm_court"))), "norm_court")
        .join(F.broadcast(judges.select(F.col("id").alias("judge_id"), F.col("normalized_name").alias("norm_judge"))), "norm_judge", "left")
        .join(F.broadcast(case_types.select(F.col("id").alias("case_type_id"), F.col("normalized_name").alias("norm_type"))), "norm_type")
        .select(
            "id",
            "case_number",
            "court_id",
            F.coalesce(F.col("title"), F.lit("")).alias("title"),
            F.col("parsed_date").alias("filed_date"),
            "case_type_id",
            "judge_id",
            F.coalesce(F.col("docket_text"), F.lit("")).alias("docket_text"),
            F.col("lower_status").alias("status"),
            now.alias("created_at"),
            now.alias("updated_at"),
        )
    )
    if existing_cases is not None:
        untouched = existing_cases.join(cases.select("case_number"), "case_number", "left_anti")
        cases = untouched.unionByName(cases)

    # --- parties: from EVERY good row (reference inserts per processed
    # row with ON CONFLICT DO NOTHING), dedup (case_id, party_id, role).
    # `exploded` built above (fused stats job consumes it too).
    parties_dim = _upsert_dim(
        existing.get("parties"),
        exploded.select(F.col("party_name").alias("name"), F.col("norm_party").alias("normalized_name"), "_seq"),
        spark,
        max_id=stats.get("max_parties"),
    ).cache()
    party_vars = _variations(
        exploded.select(F.col("norm_party").alias("normalized_name"), F.col("party_name").alias("party")).withColumn("_ts", now),
        parties_dim, "party", F.col("_ts"),
    )
    case_parties = (
        exploded.join(case_ids.select(F.col("id").alias("case_id"), "case_number"), "case_number")
        .join(F.broadcast(parties_dim.select(F.col("id").alias("party_id"), F.col("normalized_name").alias("norm_party"))), "norm_party")
        .select("case_id", "party_id", "role")
        .dropDuplicates(["case_id", "party_id", "role"])
    )
    prior_cp = existing.get("case_parties")
    if prior_cp is not None:
        case_parties = prior_cp.select("case_id", "party_id", "role").unionByName(
            case_parties
        ).dropDuplicates(["case_id", "party_id", "role"])

    n_failed = total_read - n_good

    # --- errors table: keyed (run_id, record_hash); retry_count =
    # occurrences - 1 (SURVEY S6).
    # details mirrors the reference's JSONB payload (ingest.py:218-224,
    # schema.sql:199) as a TYPED nested struct — queryable columns, not
    # an opaque string; to_json(details) reproduces the JSONB form.
    suggestion = (
        F.when(F.col("error_code") == "BAD_DATE",
               F.lit("use ISO yyyy-MM-dd or M/d/yyyy"))
        .when(F.col("error_code") == "MISSING_CASE_NUMBER",
              F.lit("populate case_number"))
        .when(F.col("error_code") == "STATUS_UNMAPPED",
              F.lit("status must be one of active/closed/pending/dismissed"))
        .when(F.col("error_code") == "FK_COURT", F.lit("populate court"))
        .otherwise(F.lit("inspect raw record"))
    )
    details = F.struct(
        F.struct(*[F.col(c) for c in RAW_FIELDS]).alias("raw"),
        F.struct(
            F.date_format("parsed_date", "yyyy-MM-dd").alias("parsed_date"),
            F.col("lower_status").alias("status"),
            F.col("norm_court").alias("court"),
        ).alias("normalized_attempt"),
        F.lit("process_docket").alias("context"),
        F.col("error_why").alias("why"),
        suggestion.alias("suggestion"),
    )
    errors = (
        bad.withColumn("details", details)
        .groupBy("record_hash")
        .agg(
            F.count("*").alias("_n"),
            F.min_by(
                F.struct("error_code", "error_why", "case_number", "details"),
                "_seq",
            ).alias("_f"),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            "record_hash",
            F.col("_f.case_number").alias("case_number"),
            F.col("_f.error_code").alias("error_code"),
            F.col("_f.error_why").alias("error_message"),
            F.col("_f.details").alias("details"),
            now.alias("first_seen_at"),
            now.alias("last_seen_at"),
            (F.col("_n") - 1).cast("int").alias("retry_count"),
            F.lit(False).alias("resolved"),
        )
    )

    quarantine = bad.select(
        F.lit(run_id).alias("run_id"),
        "error_code",
        F.col("error_why").alias("why"),
        F.struct(*[F.col(c) for c in RAW_FIELDS]).alias("raw"),
        F.date_format(now, "yyyy-MM-dd'T'HH:mm:ss").alias("ts"),
        "record_hash",
    )

    counts = {
        "read": total_read,
        "inserted": n_inserted,
        "updated": n_updated,
        "failed": n_failed,
        "warnings_no_parties": n_no_parties,
    }
    run_row = spark.createDataFrame(
        [(run_id, total_read, n_inserted, n_updated, n_failed)],
        "run_id long, total_read long, total_inserted long, total_updated long, total_failed long",
    ).withColumn("started_at", now).withColumn("finished_at", now)

    prior_runs = existing.get("ingest_runs")
    runs = run_row if prior_runs is None else prior_runs.unionByName(run_row, allowMissingColumns=True)
    prior_errors = existing.get("ingest_errors")
    all_errors = errors if prior_errors is None else prior_errors.unionByName(errors, allowMissingColumns=True)

    tables = {
        "cases": cases,
        "courts": courts,
        "judges": judges,
        "case_types": case_types,
        "parties": parties_dim,
        "case_parties": case_parties,
        "court_name_variations": court_vars,
        "judge_name_variations": judge_vars,
        "party_name_variations": party_vars,
        "ingest_runs": runs,
        "ingest_errors": all_errors,
    }
    return IngestResult(
        run_id=run_id, counts=counts, tables=tables, quarantine=quarantine,
        errors=errors,
        cached=[validated, dim_src, final_rows, exploded,
                courts, judges, case_types, parties_dim, case_ids],
    )
