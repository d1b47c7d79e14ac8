"""Scheme planner — the reference's "query optimizer"
(compression/SchemePicker.hpp:70-221 + scheme gates).

Decision tree per column chunk (P2):
  1. all-null or single distinct set value → ONE_VALUE
     (SchemePicker.hpp:118-123)
  2. cascade depth exhausted → UNCOMPRESSED (SchemePicker.hpp:124-129)
  3. candidate gating (stats-driven, §4.1):
       RLE iff avg_run_length > 2          (scheme/integer/RLE.cpp:12-16)
       FREQUENCY iff top share ≥ 0.9       (templated/Frequency.hpp:23-48)
       DELTA iff sorted                    (scheme/integer/PBP.cpp:60-65)
       TRUNCATION iff range fits u16       (scheme/integer/Truncation.cpp)
       FSST iff unique ≥ set/2 and total_length > 16 KiB
                                           (scheme/string/Fsst.cpp:119-127)
  4. SAMPLE mode: estimate compressed size per candidate on a
     run-preserving sample, argmax ratio (scheme/CompressionScheme.cpp:8-46);
     TRY_ALL mode: encode fully, keep smallest (SchemePicker.hpp:141-161)
  5. regression guard: best ratio < 1 → UNCOMPRESSED
     (SchemePicker.hpp:181-190)

Pure Python over numpy arrays — runs identically driver-side (small tables)
and inside executors via applyInPandas (the 100 TB path: the planner ships
to the data, never the reverse).
"""

from __future__ import annotations

import numpy as np

from btrblocks_spark.config import DEFAULT_CONFIG, BtrBlocksConfig, SchemeSelection
from btrblocks_spark.format import codecs
from btrblocks_spark.format.sampling import run_sample

_KIND_BY_SPARK_TYPE = {
    "integer": "int",
    "int": "int",
    "bigint": "int",
    "long": "int",
    "smallint": "int",
    "short": "int",
    "tinyint": "int",
    "double": "double",
    "float": "double",
    "string": "string",
    "varchar": "string",
    # beyond the reference (btrfiles/btrfiles.hpp:20-22 SKIPs dates):
    # temporal columns plan as epoch int64 — runs/sortedness/dict all apply
    "timestamp": "int",
    "timestamp_ntz": "int",
    "date": "int",
}


def kind_of(spark_type: str) -> str:
    return _KIND_BY_SPARK_TYPE.get(spark_type.lower(), "skip")


def candidate_schemes(kind: str, values, mask, config: BtrBlocksConfig) -> list[str]:
    """Stat-gated candidates (step 3)."""
    set_vals = values[mask] if mask is not None and not mask.all() else values
    n = len(set_vals)
    if n == 0:
        return ["one_value"]
    enabled = set(
        config.schemes_for(
            {"int": "integer", "double": "double", "string": "string"}[kind]
        )
    ) | {"uncompressed"}
    cands = ["uncompressed"]

    if kind in ("int", "double"):
        arr = set_vals
        # uniqueness on the BIT view for doubles: float np.unique collapses
        # -0.0/0.0 (and NaN payloads), which would route a [-0.0, 0.0]
        # chunk to one_value and lose the sign of zero on decode
        uniq = np.unique(arr.view(np.int64) if kind == "double" else arr)
        if len(uniq) == 1:
            return ["one_value"]
        runs = 1 + int((arr[1:] != arr[:-1]).sum()) if n > 1 else 1
        avg_run = n / runs
        if "rle" in enabled and avg_run > config.rle_min_avg_run:
            cands.append("rle")
        if "dict" in enabled and len(uniq) < n:
            cands.append("dict")
        counts = np.unique(arr, return_counts=True)[1]
        if "frequency" in enabled and counts.max() / n >= config.frequency_min_top_share:
            cands.append("frequency")
        if kind == "int":
            rng = int(arr.max()) - int(arr.min())
            if "truncation" in enabled and rng <= 0xFFFF:
                cands.append("truncation")
            if "for" in enabled:
                cands.append("for")
            if "delta" in enabled and bool(np.all(np.diff(arr) >= 0)):
                cands.append("delta")
            if "dod" in enabled and n > 2:
                # delta-of-delta pays off when spacing is near-regular:
                # second differences span far less than the values
                d2 = np.diff(arr.astype(np.int64), n=2)
                if len(d2) and int(np.abs(d2).max()) < max(rng // 16, 2):
                    cands.append("dod")
            if "bp" in enabled:
                cands.append("bp")
            if "pfor" in enabled:
                cands.append("pfor")
        else:
            # gate the decimal-family candidates on a RUN SAMPLE, not the
            # full chunk: the gate's split result is discarded (the size
            # estimate re-encodes the sample anyway), so a full-chunk
            # 23-pass exponent search + ALP encode per 65k-row chunk was
            # pure thrown-away work — the dominant planner cost for double
            # columns. The exception-rate estimate off ~640 sampled values
            # gates the same way encode()'s own >50% bail does.
            if "pseudodecimal" in enabled or "alp" in enabled:
                gate_arr, _gm = run_sample(
                    np.asarray(arr, dtype=np.float64),
                    np.ones(n, dtype=bool),
                    config.sample_count,
                    config.sample_size,
                )
                gmask = np.ones(len(gate_arr), dtype=bool)
            if "pseudodecimal" in enabled:
                sig, exp, exc = codecs._pseudodecimal_split(gate_arr, gmask)
                if exc.mean() <= 0.5:
                    cands.append("pseudodecimal")
            if "alp" in enabled:
                # one chunk-wide (e, f) vs pseudodecimal's per-value search;
                # encode() itself bails >50% exceptions, so a cheap gate on
                # the same sampled stats suffices
                _, _, _, aexc = codecs._alp_split(gate_arr, gmask)
                if aexc.mean() <= 0.5:
                    cands.append("alp")
            if "alp_rd" in enabled:
                # bit-slicing variant is total (never rejects); the size race
                # + regression guard drop it when exponents don't cluster
                cands.append("alp_rd")
    else:  # string
        uniq = set(set_vals.tolist())
        if len(uniq) == 1:
            return ["one_value"]
        if "dict" in enabled:
            cands.append("dict")
        # legacy fixed-width dictionary (FixedDictionary.cpp): eligible
        # only while the dictionary fits the fixed code width
        if "dict8" in enabled and len(uniq) <= 256:
            cands.append("dict8")
        if "dict16" in enabled and 256 < len(uniq) <= 65536:
            cands.append("dict16")
        total_len = sum(len(x) for x in set_vals)
        if (
            "fsst" in enabled
            and len(uniq) >= n / 2
            and total_len > config.fsst_min_total_length
        ):
            cands.append("fsst")
    return cands


def choose_scheme(
    spark_type: str,
    values,
    mask=None,
    config: BtrBlocksConfig = DEFAULT_CONFIG,
    forced: str | None = None,
) -> dict:
    """Pick the best scheme for one column chunk. Returns
    {scheme, est_ratio, raw_size, est_size, candidates}."""
    kind = kind_of(spark_type)
    if kind == "skip":
        return {"scheme": "skip", "est_ratio": 1.0, "raw_size": 0, "est_size": 0, "candidates": []}

    if kind == "int":
        values = np.asarray(values, dtype=np.int64)
    elif kind == "double":
        values = np.asarray(values, dtype=np.float64)
    else:
        values = np.asarray(values, dtype=object)
    n = len(values)
    if mask is None:
        mask = np.array([x is not None for x in values]) if kind == "string" else ~(
            np.isnan(values) if kind == "double" else np.zeros(n, dtype=bool)
        )
    mask = np.asarray(mask, dtype=bool)

    int_w = codecs._elem_width(values[mask]) if kind == "int" else 4
    raw_size = (
        n * int_w if kind == "int" else n * 8 if kind == "double" else int(sum(len(x or "") for x in values)) + 4 * n
    )

    forced = forced or config.forced_scheme_for(spark_type)
    if forced:
        enc = codecs.encode(kind, forced, values, mask, depth=config.max_cascade_depth)
        return {
            "scheme": forced,
            "est_ratio": raw_size / max(enc.size_bytes, 1),
            "raw_size": raw_size,
            "est_size": enc.size_bytes,
            "candidates": [forced],
            "scheme_tree": codecs.describe_tree(kind, enc, config.max_cascade_depth),
        }

    # step 1: trivial cases (bit-view uniqueness for doubles — see
    # candidate_schemes: float unique would collapse -0.0/0.0)
    set_vals = values[mask]
    if kind == "double":
        _uniq_one = len(np.unique(set_vals.view(np.int64))) == 1
    elif kind == "string":
        _uniq_one = len(set(set_vals.tolist())) == 1
    else:
        _uniq_one = len(np.unique(set_vals)) == 1
    if len(set_vals) == 0 or _uniq_one:
        enc = codecs.encode(kind, "one_value", values, mask)
        return {
            "scheme": "one_value",
            "est_ratio": raw_size / max(enc.size_bytes, 1),
            "raw_size": raw_size,
            "est_size": enc.size_bytes,
            "candidates": ["one_value"],
            "scheme_tree": "one_value",
        }

    cands = candidate_schemes(kind, values, mask, config)

    if config.scheme_selection == SchemeSelection.TRY_ALL:
        est_values, est_mask, scale = values, mask, 1.0
    else:
        est_values, est_mask = run_sample(values, mask, config.sample_count, config.sample_size)
        sample_raw = (
            len(est_values) * int_w
            if kind == "int"
            else len(est_values) * 8
            if kind == "double"
            else int(sum(len(x or "") for x in est_values)) + 4 * len(est_values)
        )
        scale = raw_size / max(sample_raw, 1)

    # Cardinality/entropy-sensitive schemes are estimated on the FULL chunk:
    # a 640-value run sample sees a high-cardinality dictionary as
    # ~all-distinct and a large string pool as incompressible, systematically
    # under-picking dict/fsst (one unique/zlib pass per chunk is cheap — the
    # stats pass already paid it).
    _FULL_EST = {"dict", "fsst"}

    best, best_size, best_enc = "uncompressed", None, None
    sizes = {}
    for scheme in cands:
        try:
            if scheme in _FULL_EST:
                enc = codecs.encode(kind, scheme, values, mask, depth=config.max_cascade_depth)
                full_size = float(enc.size_bytes)
            else:
                enc = codecs.encode(kind, scheme, est_values, est_mask, depth=config.max_cascade_depth)
                full_size = enc.size_bytes * scale
        except ValueError:
            continue
        sizes[scheme] = full_size
        if best_size is None or full_size < best_size:
            best, best_size, best_enc = scheme, full_size, enc

    est_size = int(best_size if best_size is not None else raw_size)

    # step 5: regression guard
    if est_size >= raw_size:
        best, est_size, best_enc = "uncompressed", raw_size, None

    tree = (
        codecs.describe_tree(kind, best_enc, config.max_cascade_depth)
        if best_enc is not None
        else best
    )
    return {
        "scheme": best,
        "est_ratio": raw_size / max(est_size, 1),
        "raw_size": raw_size,
        "est_size": est_size,
        "candidates": cands,
        "scheme_tree": tree,
    }



def suggest_order_keys(df, max_keys: int = 3, sample_rows: int = 8192) -> list[str]:
    """Auto-select write order keys for maximum compressibility — the
    sort-key planning step the reference leaves to file order
    (storage/Relation.cpp:42-69); a lakehouse writer gets to choose.

    Not a proxy heuristic: candidate orderings are EVALUATED through the
    actual codec cost model on one hash-deterministic sample — sort the
    sample per candidate, run choose_scheme on every column, sum estimated
    bytes, keep the cheapest. Candidates: NDV-ascending low-cardinality
    keys (maximizes runs in correlated columns) and NDV-descending
    (makes wide id/price columns sorted → delta/FOR-friendly), each with a
    high-NDV tiebreaker for a near-unique total order (deterministic
    chunking needs one).

    Cost: one sample scan (no shuffle) + driver-side pandas sorts of
    ~sample_rows rows; independent of table size."""
    from pyspark.sql import functions as F

    usable = [
        f.name
        for f in df.schema.fields
        if kind_of(f.dataType.simpleString()) in ("int", "double", "string")
    ]
    if not usable:
        return []
    n_total = df.count()
    frac_mod = max(1, n_total // sample_rows)
    sample = (
        df.filter(F.abs(F.xxhash64(*[F.col(c) for c in usable])) % frac_mod == 0)
        .select(usable)
        .toPandas()
    )
    if len(sample) == 0:
        return usable[:1]
    ndv = {c: sample[c].nunique(dropna=True) for c in usable}
    n = len(sample)
    low_first = sorted(
        [c for c in usable if ndv[c] < n * 0.5], key=lambda c: (ndv[c], c)
    )[:max_keys]
    high_first = sorted(usable, key=lambda c: (-ndv[c], c))[:max_keys]
    tiebreak = max(usable, key=lambda c: (ndv[c], c))
    candidates = []
    for base in (low_first, high_first):
        keys = list(base)
        if tiebreak not in keys:
            keys.append(tiebreak)
        if keys and keys not in candidates:
            candidates.append(keys)
    if not candidates:
        return [tiebreak]

    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}

    def est_total(keys: list[str]) -> int:
        ordered = sample.sort_values(keys, kind="mergesort")
        total = 0
        for c in usable:
            col = ordered[c]
            mask = col.notna().to_numpy()
            vals = col.to_numpy()
            if kind_of(types[c]) == "int":
                vals = col.fillna(0).to_numpy()
            elif kind_of(types[c]) == "double":
                vals = col.fillna(0.0).to_numpy()
            total += choose_scheme(types[c], vals, mask)["est_size"]
        return total

    return min(candidates, key=est_total)


def sort_key_advisor(
    df,
    candidates: list[str],
    data_cols: list[str],
    exact: bool = False,
    rsd: float = 0.05,
):
    """Rank candidate sort keys by the RLE-run lower bound their ordering
    implies: for sort column C, ``est_total_runs = Σ_d n_distinct(C, d)``
    over the data columns d (each distinct (C, d) combination contributes
    at least one run of d once the table is range-sorted by C) — fewer
    runs = better RLE/dict-RLE cascades downstream. This drives the
    layout choice the writer's repartitionByRange key makes (the reference
    leaves ordering to ingest order, storage/Relation.cpp getRanges
    SEQUENTIAL; a cluster-scale writer gets to CHOOSE).

    Default is the SKETCHED estimator: one ``approx_count_distinct``
    (HyperLogLog++, relative error ``rsd``) per (C, d) pair, all computed
    in a single pass with NO Expand — the shuffle carries one fixed-size
    HLL register set per pair per partition (KBs) instead of the exploded
    distinct-value stream (the exact plan's Expand duplicates every row
    |pairs|-fold and shuffles the deduped pairs; fleet-biggest shuffle
    line in SHUFFLE_AUDIT.md before this existed). The advisor is a
    heuristic RANKING, so ±5% per-term error is acceptable — candidates
    whose run totals are within sketch error of each other are equally
    good layout choices. ``exact=True`` is the escape hatch that restores
    bit-exact countDistinct (and is what the oracle-checked
    ``format_sort_advisor`` query uses).

    Returns rows (sort_col, est_total_runs, est_avg_run_len), one per
    candidate, computed from a single aggregate row."""
    from pyspark.sql import functions as F

    if exact:
        m = df.agg(
            F.count("*").alias("n_rows"),
            *[
                F.countDistinct(c, d).alias(f"np_{c}_{d}")
                for c in candidates
                for d in data_cols
            ],
        )
    else:
        # sketch over a 64-bit PAIR HASH, not the struct itself: each
        # involved column is xxhash64'd ONCE per row and pairs combine two
        # fixed-width ints (round-7: 2.8× faster than 30 struct
        # serializations per row — this agg is pure CPU, so per-row hash
        # work IS the runtime; hash collisions add ~(pairs²/2⁶⁴) ≪ rsd).
        # The when-guard NULLs out tuples with a NULL member so the sketch
        # counts the SAME domain countDistinct does (xxhash64 SKIPS null
        # fields, so an unguarded combine would fold NULL-bearing tuples
        # into real buckets — a ranking skew on NULL-heavy columns, not
        # sketch error)
        cols = list(dict.fromkeys(list(candidates) + list(data_cols)))
        hashed = df.select(
            *[F.xxhash64(c).alias(f"_h_{c}") for c in cols],
            *[F.col(c).isNotNull().alias(f"_nn_{c}") for c in cols],
        )
        m = hashed.agg(
            F.count("*").alias("n_rows"),
            *[
                F.approx_count_distinct(
                    F.when(
                        F.col(f"_nn_{c}") & F.col(f"_nn_{d}"),
                        F.xxhash64(f"_h_{c}", f"_h_{d}"),
                    ),
                    rsd,
                ).alias(f"np_{c}_{d}")
                for c in candidates
                for d in data_cols
            ],
        )
    total = {
        c: sum((F.col(f"np_{c}_{d}") for d in data_cols), F.lit(0))
        for c in candidates
    }
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("sort_col"),
                total[c].cast("long").alias("est_total_runs"),
                F.round(
                    F.try_divide(
                        F.col("n_rows").cast("double") * len(data_cols),
                        total[c].cast("double"),
                    ),
                    6,
                ).alias("est_avg_run_len"),
            )
            for c in candidates
        ]
    )
    return m.select(F.explode(rows).alias("r")).select("r.*")


def fd_advisor(
    df,
    pairs: list[tuple[str, str]],
    exact: bool = False,
    rsd: float = 0.05,
):
    """Functional-dependency profile over candidate (determinant,
    dependent) column pairs: det → dep holds iff n_distinct(det) ==
    n_distinct(det, dep) — a held FD means the dependent column is
    derivable from the determinant's dictionary, so a column-group
    encoding (shared dict / 1:1 mapping table) beats encoding the columns
    independently (the column-GROUP analog of the reference's per-column
    stats/NumberStats.hpp / stats/StringStats.hpp).

    Default is the SKETCHED estimator, the same shape as
    ``sort_key_advisor``: one ``approx_count_distinct`` (HLL++, relative
    error ``rsd``) per determinant and per pair, all in one pass with NO
    Expand — the shuffle carries fixed-size HLL register sets (KBs)
    instead of the exact plan's |aggs|-fold row expansion. Because two
    independent sketches of the same cardinality differ by ~rsd each, the
    sketched verdict uses a slack band: fd_holds iff est_pairs ≤ est_det ·
    (1 + 4·rsd). An FD violated by less than the sketch band is
    indistinguishable from held — acceptable for an ADVISOR (a near-held
    FD still compresses well under the column-group encoding); marginal
    cases get the exact pass. ``exact=True`` restores bit-exact
    countDistinct and strict equality (what the oracle-checked
    ``format_fd_profile`` query uses).

    Returns rows (det_col, dep_col, n_det, n_pairs, fd_holds,
    deps_per_det), one per pair, computed from a single aggregate row."""
    from pyspark.sql import functions as F

    dets = list(dict.fromkeys(det for det, _ in pairs))

    if exact:
        m = df.agg(
            *[F.countDistinct(c).alias(f"nd_{c}") for c in dets],
            *[F.countDistinct(c, d).alias(f"np_{c}_{d}") for c, d in pairs],
        )
    else:
        # pair sketches run over a 64-bit hash combine with per-column
        # xxhash64 computed ONCE per row (the sort_key_advisor round-7
        # optimization — struct serialization per pair per row was the
        # whole runtime); the when-guard keeps the NULL-tuple domain
        # matched to countDistinct. Determinant sketches hash the bare
        # column (guarded: xxhash64 skips NULL fields, so an unguarded
        # hash would count a NULL bucket countDistinct drops)
        cols = list(dict.fromkeys(dets + [d for _, d in pairs]))
        hashed = df.select(
            *[F.xxhash64(c).alias(f"_h_{c}") for c in cols],
            *[F.col(c).isNotNull().alias(f"_nn_{c}") for c in cols],
        )
        m = hashed.agg(
            *[
                F.approx_count_distinct(
                    F.when(F.col(f"_nn_{c}"), F.col(f"_h_{c}")), rsd
                ).alias(f"nd_{c}")
                for c in dets
            ],
            *[
                F.approx_count_distinct(
                    F.when(
                        F.col(f"_nn_{c}") & F.col(f"_nn_{d}"),
                        F.xxhash64(f"_h_{c}", f"_h_{d}"),
                    ),
                    rsd,
                ).alias(f"np_{c}_{d}")
                for c, d in pairs
            ],
        )
    slack = 1.0 if exact else 1.0 + 4.0 * rsd
    rows = F.array(
        *[
            F.struct(
                F.lit(det).alias("det_col"),
                F.lit(dep).alias("dep_col"),
                F.col(f"nd_{det}").cast("long").alias("n_det"),
                F.col(f"np_{det}_{dep}").cast("long").alias("n_pairs"),
                (
                    F.col(f"np_{det}_{dep}") == F.col(f"nd_{det}")
                    if exact
                    else F.col(f"np_{det}_{dep}")
                    <= F.col(f"nd_{det}") * F.lit(slack)
                ).alias("fd_holds"),
                # empty base table: 0 determinant values → NULL ratio
                # (oracle x/0 parity), never an ANSI abort
                F.round(
                    F.try_divide(
                        F.col(f"np_{det}_{dep}").cast("double"),
                        F.col(f"nd_{det}").cast("double"),
                    ),
                    6,
                ).alias("deps_per_det"),
            )
            for det, dep in pairs
        ]
    )
    return m.select(F.explode(rows).alias("r")).select("r.*")
