"""Per-month key-bounds sidecar (engine._BOUNDS_COLS): the sync's
phase-1 retraction probe must open only candidate month directories —
read I/O scaling with the delta — while the bounds stay a strict
superset of reality across every crash window (a missed month would be
a silently-unretracted row forever)."""

from __future__ import annotations

import datetime as dt
import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mrsboraetl_spark.engine import PipelineRunner
from tests.fixtures import make_sources, to_spark


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdfs = make_sources(n_persons=25, seed=11)
    obs_pdf, enc_pdf = pdfs["obs"].copy(), pdfs["encounter"].copy()
    wm = obs_pdf["date_created"].max()
    # Clamp date_changed stragglers so the sync delta below is ONLY the
    # new obs (same discipline as test_sync_rewrites_only_affected_months).
    late = enc_pdf["date_changed"].notna() & (enc_pdf["date_changed"] > wm)
    enc_pdf.loc[late, "date_changed"] = wm
    pdfs = dict(pdfs, obs=obs_pdf, encounter=enc_pdf)
    dfs = to_spark(spark, pdfs)
    root = str(tmp_path_factory.mktemp("bounds") / "store")
    runner = PipelineRunner(spark, root, partitioned=True)
    runner.run(dfs, mode="rebuild")
    return dict(runner=runner, pdfs=pdfs, dfs=dfs, wm=wm)


def test_bounds_sidecar_exact_after_rebuild(spark, built):
    from mrsboraetl_spark.config import SYNTHETIC_ENCOUNTER_OFFSET

    runner = built["runner"]
    bounds = runner._load_bounds("flat_obs")
    assert bounds, "rebuild must write the bounds sidecar"
    # encounter bounds cover the REAL population only (synthetic ids at
    # SYNTHETIC_ENCOUNTER_OFFSET+ would stretch the range over every
    # probe key); person bounds have no synthetic class.
    real_enc = F.when(
        F.col("encounter_id") < SYNTHETIC_ENCOUNTER_OFFSET,
        F.col("encounter_id"),
    )
    actual = (
        spark.read.parquet(runner._path("flat_obs"))
        .groupBy("p_month")
        .agg(
            F.min(real_enc).alias("elo"),
            F.max(real_enc).alias("ehi"),
            F.min("person_id").alias("plo"),
            F.max("person_id").alias("phi"),
        )
        .collect()
    )
    assert {r["p_month"] for r in actual} == set(bounds)
    for r in actual:
        ent = bounds[r["p_month"]]
        if r["elo"] is None:
            assert "encounter_id" not in ent  # synthetic-only month
        else:
            assert ent["encounter_id"] == [r["elo"], r["ehi"]]
        assert ent["person_id"] == [r["plo"], r["phi"]]


def test_probe_reader_prunes_to_candidate_months(spark, built, monkeypatch):
    runner = built["runner"]
    reader = runner._make_probe_reader("flat_obs")
    assert reader is not None
    bounds = runner._load_bounds("flat_obs")
    # A key inside exactly one month's range must prune to month(s)
    # whose range contains it; a key beyond every range reads nothing.
    from mrsboraetl_spark.config import SYNTHETIC_ENCOUNTER_OFFSET

    target = spark.read.parquet(runner._path("flat_obs"))
    row = (
        target.filter(F.col("encounter_id") < SYNTHETIC_ENCOUNTER_OFFSET)
        .select("encounter_id", "p_month")
        .first()
    )
    keys = spark.createDataFrame(
        [(int(row["encounter_id"]),)], "encounter_id long"
    )
    hit = reader(keys, "encounter_id")
    # Candidate set = months whose real-population range contains the
    # key, plus synthetic-only months that omit the column from the
    # sidecar (unconditional candidates in the reader).
    got_months = {
        m for m, ent in bounds.items()
        if "encounter_id" not in ent
        or ent["encounter_id"][0] <= row["encounter_id"] <= ent["encounter_id"][1]
    }
    assert got_months  # at least the row's own month
    assert hit.count() > 0
    # A key beyond every recorded range (but BELOW the synthetic
    # sentinel, so the conservative path stays off) reads only the
    # unconditional synthetic-only months, if any.
    beyond = max(
        ent["encounter_id"][1]
        for ent in bounds.values()
        if "encounter_id" in ent
    ) + 10_000
    assert beyond < SYNTHETIC_ENCOUNTER_OFFSET
    # Directory-level: only the unconditional synthetic-only months are
    # even opened (spied — the In pushdown below would mask a month-
    # pruning regression if we only counted rows).  Row-level (r8): the
    # small-delta In filter then reduces the probed content to exactly
    # the probed key — absent from those months, so zero rows.
    opened: list = []
    orig_rtm = type(runner).read_target_months

    def spy_rtm(self, table, months):
        opened.append(tuple(months))
        return orig_rtm(self, table, months)

    monkeypatch.setattr(type(runner), "read_target_months", spy_rtm)
    miss = reader(
        spark.createDataFrame([(beyond,)], "encounter_id long"),
        "encounter_id",
    )
    monkeypatch.undo()
    uncond = sorted(
        m for m, ent in bounds.items() if "encounter_id" not in ent
    )
    assert opened == [tuple(uncond)], (opened, uncond)
    assert miss.count() == 0


def test_probe_driver_transfer_is_month_bounded(spark, built, monkeypatch):
    """A many-key delta must NOT collect one row per key: the probe
    aggregates Spark-side (collect_set of matched months + one
    above-sentinel flag) and transfers a single row to the driver —
    the only O(delta) driver action flagged in round 7."""
    # PySpark 4 dispatches to the classic DataFrame subclass, which
    # overrides collect — patch the concrete class, not the facade.
    try:
        import pyspark.sql.classic.dataframe as _dfmod
    except ImportError:  # pragma: no cover - pyspark < 4
        import pyspark.sql.dataframe as _dfmod

    runner = built["runner"]
    reader = runner._make_probe_reader("flat_obs")
    assert reader is not None
    # 5,000 distinct probe keys — a catch-up-sized delta relative to
    # this fixture; pre-fix the probe collected 5,000 rows here.
    keys = spark.range(0, 5000).select(F.col("id").alias("encounter_id"))
    sizes: list[int] = []
    orig = _dfmod.DataFrame.collect

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(_dfmod.DataFrame, "collect", spy)
    hit = reader(keys, "encounter_id")
    assert hit is not None
    assert sizes, "probe must run at least one collect"
    n_months = len(runner._load_bounds("flat_obs"))
    assert max(sizes) <= 1 + n_months, (
        f"probe collected {max(sizes)} rows for a 5,000-key delta — "
        "driver transfer must be month-bounded, not key-bounded"
    )


def test_probe_reader_unbounded_column_returns_none(built):
    reader = built["runner"]._make_probe_reader("flat_obs")
    assert reader(None, "not_a_bounds_col") is None


def test_probe_reader_synthetic_key_defeats_pruning(spark, built):
    """A probe key at/above the synthetic-id sentinel lies outside every
    recorded (real-population) range — the reader must go conservative
    and read every month, never prune on bounds that exclude it."""
    from mrsboraetl_spark.config import SYNTHETIC_ENCOUNTER_OFFSET

    runner = built["runner"]
    reader = runner._make_probe_reader("flat_obs")
    keys = spark.createDataFrame(
        [(SYNTHETIC_ENCOUNTER_OFFSET + 5,)], "encounter_id long"
    )
    res = reader(keys, "encounter_id")
    full = spark.read.parquet(runner._path("flat_obs")).count()
    assert res.count() == full


def test_sync_probe_reads_scale_with_delta(spark, built, monkeypatch):
    """A one-month-localized delta must probe (and rewrite) only a small
    month subset; a no-op sync must probe ZERO month directories."""
    runner, pdfs = built["runner"], built["pdfs"]
    obs_pdf, enc_pdf = pdfs["obs"], pdfs["encounter"]
    wm = built["wm"]

    month = enc_pdf["encounter_datetime"].dt.strftime("%Y-%m")
    modal = month.mode().iloc[0]
    cand = (
        obs_pdf[
            (obs_pdf["voided"] == 0)
            & obs_pdf["encounter_id"].isin(
                set(enc_pdf[month == modal]["encounter_id"])
            )
        ]
        .drop_duplicates("encounter_id")
        .head(3)
    )
    new_rows = []
    next_id = int(obs_pdf["obs_id"].max()) + 1
    for _, r in cand.iterrows():
        d = r.to_dict()
        d.update(
            obs_id=next_id, concept_id=5089, value_coded=None,
            value_numeric=1.25, date_created=wm + dt.timedelta(days=1),
        )
        new_rows.append(d)
        next_id += 1
    dfs2 = to_spark(
        spark,
        dict(pdfs, obs=pd.concat(
            [obs_pdf, pd.DataFrame(new_rows)], ignore_index=True
        )),
    )

    probed: list[tuple[str, tuple]] = []
    orig = PipelineRunner.read_target_months

    def spy(self, table, months):
        probed.append((table, tuple(months)))
        return orig(self, table, months)

    monkeypatch.setattr(PipelineRunner, "read_target_months", spy)

    n_months_obs = len([
        d for d in os.listdir(runner._path("flat_obs"))
        if d.startswith("p_month=")
    ])
    runner.run(dfs2, mode="sync")
    obs_probe_months = {
        m for t, ms in probed if t == "flat_obs" for m in ms
    }
    # Localized delta: the flat_obs probe+write path touches far fewer
    # months than exist (the fixture spans ~13); visit_summary recomputes
    # whole person histories so it may legitimately touch more.
    assert len(obs_probe_months) < n_months_obs / 2, (
        obs_probe_months, n_months_obs
    )

    # No-op sync: nothing changed since the watermark -> every probe's
    # candidate set is empty -> zero month directories read.
    probed.clear()
    runner.run(dfs2, mode="sync")
    assert all(ms == () for _t, ms in probed), probed


def test_interrupted_month_swap_keeps_bounds_superset(spark, built):
    """Crash INSIDE the swap loop: bounds must still cover both old and
    new month content (widen-before-swap), and the next sync converges."""
    runner = built["runner"]
    table = "flat_obs"
    path = runner._path(table)
    pre = runner._load_bounds(table)
    target = spark.read.parquet(path)
    months = sorted(
        r["p_month"]
        for r in target.select("p_month").distinct().collect()
    )[:2]
    delta = (
        target.filter(F.col("p_month").isin(months))
        # shift every key so the staged bounds differ from the old ones
        .withColumn(
            "encounter_id", (F.col("encounter_id") + F.lit(7)).cast("long")
        )
        # pin: the engine always stages from SOURCE data, never from the
        # directories it is about to swap — reading the target lazily
        # across its own swap would re-open moved files (the documented
        # write-over-read hazard); the checkpoint mimics the engine's
        # source-derived input.
        .localCheckpoint()
    )

    calls = {"n": 0}
    orig_replace = os.replace

    def exploding_replace(src, dst):
        if f"{runner.PARTITION_COL}=" in os.path.basename(dst):
            calls["n"] += 1
            if calls["n"] == 2:  # first month swapped, second mid-flight
                raise RuntimeError("injected crash between month swaps")
        return orig_replace(src, dst)

    os.replace = exploding_replace
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            runner._write_months(
                delta, path, months,
                bounds_cols=runner._BOUNDS_COLS[table],
            )
    finally:
        os.replace = orig_replace

    # The sidecar on disk is the WIDENED one: for the affected months it
    # must cover the old range AND the shifted range.
    mid = runner._load_bounds(table)
    for m in months:
        old_lo, old_hi = pre[m]["encounter_id"]
        assert mid[m]["encounter_id"][0] <= old_lo
        assert mid[m]["encounter_id"][1] >= old_hi + 7
    # Recovery: read_target restores the demoted month, a clean rewrite
    # of the same months lands exact bounds again.
    restored = runner.read_target(table)
    assert restored is not None
    restored = restored.localCheckpoint()  # same hazard for the cleanup
    leftover = [
        d for d in os.listdir(path) if d.startswith(runner._OLD_PREFIX)
    ]
    assert not leftover, leftover
    runner._write_months(
        delta, path, months, bounds_cols=runner._BOUNDS_COLS[table]
    )
    post = runner._load_bounds(table)
    for m in months:
        old_lo, old_hi = pre[m]["encounter_id"]
        assert post[m]["encounter_id"] == [old_lo + 7, old_hi + 7]
    # cleanup for module-scoped fixture users: restore original content
    runner._write(
        restored, table
    )
    final = runner._load_bounds(table)
    assert set(final) >= set(pre)


def test_bounds_file_invisible_to_spark(spark, built):
    """The underscore-prefixed sidecar (and its tmp) must never surface
    as data or break partition discovery."""
    runner = built["runner"]
    path = runner._path("flat_obs")
    assert os.path.exists(os.path.join(path, "_month_bounds.json"))
    df = spark.read.parquet(path)
    assert "p_month" in df.columns
    assert df.count() > 0


def test_missing_bounds_falls_back_to_full_probe(built):
    runner = built["runner"]
    p = runner._bounds_path("flat_obs")
    with open(p) as f:
        saved = f.read()
    try:
        os.remove(p)
        assert runner._make_probe_reader("flat_obs") is None
    finally:
        with open(p, "w") as f:
            f.write(saved)


def test_widen_bounds_missing_column_is_unprunable():
    cols = ("encounter_id", "person_id")
    a = {"encounter_id": [5, 9], "person_id": [1, 3]}
    b = {"encounter_id": [7, 20]}  # person bounds unknown on one side
    w = PipelineRunner._widen_bounds(a, b, cols)
    assert w["encounter_id"] == [5, 20]
    assert "person_id" not in w  # absent = cannot prune, never 'empty'
    assert PipelineRunner._widen_bounds(None, b, cols) == b


def test_bloom_sidecar_prunes_person_probe(spark, built):
    """r8 (VERDICT r7 item 3): per-month [min,max] on person_id prunes
    ~nothing by construction (person ids are uniform across months);
    the per-month Bloom sidecar lets person-keyed probes open only the
    months actually holding a probed person — superset-exact (every
    row of the probed person is in the pruned read) and genuinely
    pruning (fewer months than the whole target)."""
    runner = built["runner"]
    bounds = runner._load_bounds("flat_obs")
    ent = next(iter(bounds.values()))
    assert "bloom:person_id" in ent, sorted(ent)
    b = ent["bloom:person_id"]
    # r9: raw bytes from the binary sidecar (m bits / 8), not hex-JSON
    assert isinstance(b["w"], bytes)
    assert b["m"] % 64 == 0 and len(b["w"]) == b["m"] // 8
    # and the JSON sidecar itself carries no bloom payload any more
    with open(runner._bounds_path("flat_obs")) as f:
        assert "bloom:" not in f.read()

    tgt = spark.read.parquet(runner._path("flat_obs"))
    victim = int(tgt.select("person_id").first()["person_id"])
    mine = tgt.filter(F.col("person_id") == victim)
    true_rows, true_months = (
        mine.count(),
        mine.select("p_month").distinct().count(),
    )
    assert true_months < len(bounds)  # premise: person is month-local

    reader = runner._make_probe_reader("flat_obs")
    keys = spark.createDataFrame([(victim,)], "person_id long")
    hit = reader(keys, "person_id")
    assert hit.filter(F.col("person_id") == victim).count() == true_rows
    assert hit.count() < tgt.count(), "bloom pruned nothing"

    # A person the corpus never saw: every blooming month is pruned.
    miss = reader(
        spark.createDataFrame([(99_999_999,)], "person_id long"),
        "person_id",
    )
    assert miss.count() == 0


def test_bloom_widen_is_exact_union_or_omission():
    """Widen-before-swap for Blooms: equal (m, j) => bitwise OR (the
    EXACT set union, so no key of either side can test negative);
    resized filters cannot be merged => the entry is omitted, leaving
    the month unprunable (conservative) until the exact pass."""
    w = PipelineRunner._widen_bounds
    a = {"bloom:person_id": {"m": 1024, "j": 7, "w": b"\x0f" + b"\x00" * 127}}
    b = {"bloom:person_id": {"m": 1024, "j": 7, "w": b"\xf0" + b"\x00" * 127}}
    merged = w(a, b, {})
    assert merged["bloom:person_id"]["w"].startswith(b"\xff")
    # parameter mismatch: omit, never guess
    c = {"bloom:person_id": {"m": 2048, "j": 7, "w": b"\xff" + b"\x00" * 255}}
    assert "bloom:person_id" not in w(a, c, {})
    # one-sided: omit
    assert "bloom:person_id" not in w(a, {}, {})
    # old None: the staged entry stands alone
    assert w(None, b, {}) is b
    # r9 resize boundary (VERDICT r8 item 3): a month whose filter was
    # re-sized across the old 2^17 cap and the new 2^23 cap meets the
    # same rule — unmergeable, omitted, unprunable until the exact pass
    old_cap = {"bloom:person_id": {"m": 1 << 17, "j": 7, "w": b"\xff" * (1 << 14)}}
    new_cap = {"bloom:person_id": {"m": 1 << 23, "j": 7, "w": b"\xff" * (1 << 20)}}
    assert "bloom:person_id" not in w(old_cap, new_cap, {})
    # legacy hex entries (pre-r9 sidecar read during an upgrade window)
    # still merge with byte entries of equal (m, j)
    hx = {"bloom:person_id": {"m": 1024, "j": 7, "w": "f0" + "00" * 127}}
    merged2 = w(hx, a, {})
    assert merged2["bloom:person_id"]["w"].startswith(b"\xff")


def test_bloom_probe_driver_transfer_is_month_bounded(
    spark, built, monkeypatch
):
    """The Bloom hit test transfers ONE row to the driver (surviving
    month set + over flag) regardless of how many keys are probed —
    the same contract the range probe was held to this round."""
    try:
        import pyspark.sql.classic.dataframe as _dfmod
    except ImportError:  # pragma: no cover - pyspark < 4
        import pyspark.sql.dataframe as _dfmod

    runner = built["runner"]
    bounds = runner._load_bounds("flat_obs")
    blooms = {
        m: e["bloom:person_id"]
        for m, e in bounds.items()
        if "bloom:person_id" in e
    }
    assert blooms
    kdf = (
        spark.range(0, 3000)
        .select(F.col("id").cast("long").alias("_k"))
        .distinct()
    )
    sizes: list[int] = []
    orig = _dfmod.DataFrame.collect

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(_dfmod.DataFrame, "collect", spy)
    keep = runner._bloom_hit_months(kdf, None, blooms)
    assert keep is not None
    assert sizes and max(sizes) == 1, sizes


def test_bloom_synthetic_key_abandons_pruning(spark, built):
    """A probed key at/above the synthetic sentinel was excluded from
    the filters at build time — the hit test must refuse to prune."""
    from mrsboraetl_spark.config import SYNTHETIC_ENCOUNTER_OFFSET

    runner = built["runner"]
    bounds = runner._load_bounds("flat_obs")
    blooms = {
        m: e["bloom:person_id"]
        for m, e in bounds.items()
        if "bloom:person_id" in e
    }
    kdf = spark.createDataFrame(
        [(SYNTHETIC_ENCOUNTER_OFFSET + 5,)], "_k long"
    )
    assert (
        runner._bloom_hit_months(
            kdf, SYNTHETIC_ENCOUNTER_OFFSET, blooms
        )
        is None
    )


def test_bloom_hash_survives_ansi_overflow_keys(spark):
    """r8 review finding: `xxhash64(k) + i*step` overflows a long for
    keys whose xxhash64 lands near Long.MAX (person_id 887018216 →
    9223372033475171967) and Spark 4's default ANSI mode turns that
    into ARITHMETIC_OVERFLOW — a permanent sync-killer at production
    id scale.  The position expression reduces both terms mod m before
    the addition (identical value by modular identity, every
    intermediate < 2^21)."""
    df = spark.createDataFrame(
        [(887018216, i) for i in range(7)], "_k long, _i int"
    ).withColumn("_m", F.lit(1 << 17).cast("long"))
    rows = df.select(
        "_i", PipelineRunner._bloom_pos_expr().alias("pos")
    ).collect()
    assert len(rows) == 7
    assert all(0 <= r["pos"] < (1 << 17) for r in rows)
    # the stride must stay odd (full cycle of the power-of-two table):
    # 7 rounds of the same key hit 7 distinct positions
    assert len({r["pos"] for r in rows}) == 7


def test_small_delta_probe_pushes_isin_to_scan(spark, built):
    """r8 (PERF.md 'isin file skipping' item): a probe for a handful of
    keys pushes the key set into the parquet scan as an In filter, so
    PK-sorted row-group statistics skip inside the candidate month
    directories — and the probe result is EXACTLY the probed keys'
    rows (the filter is semantics-preserving: probe consumers look up
    exactly these keys)."""
    runner = built["runner"]
    reader = runner._make_probe_reader("flat_obs")
    tgt = spark.read.parquet(runner._path("flat_obs"))
    victims = [
        int(r["person_id"])
        for r in tgt.select("person_id").distinct().limit(3).collect()
    ]
    keys = spark.createDataFrame([(v,) for v in victims], "person_id long")
    hit = reader(keys, "person_id")
    want = tgt.filter(F.col("person_id").isin(victims)).count()
    assert hit.count() == want
    assert (
        hit.filter(~F.col("person_id").isin(victims)).count() == 0
    ), "small-delta probe must return only probed-key rows"
    plan = hit._jdf.queryExecution().sparkPlan().toString()
    assert "PushedFilters: [In(person_id" in plan, plan[:2000]

    # Past the gate, the probe keeps the join-only path (no driver
    # collect of the key set, no giant In expression).
    many = spark.range(0, runner._PROBE_ISIN_MAX * 10).select(
        F.col("id").alias("person_id")
    )
    wide = reader(many, "person_id")
    plan = wide._jdf.queryExecution().sparkPlan().toString()
    assert "In(person_id" not in plan


def test_probe_with_null_keys_neither_crashes_nor_misses(spark, built):
    """r8 review finding: orders.encounter_id is nullable and
    flat_orders' affected-key frame carries the nulls through, so a
    routine small delta can contain a NULL probe key.  A null matches
    no target row (probe consumers equi-join on the key); it must be
    dropped by the reader's normalization — not crash the isin
    collect's int(), and not defeat the valid keys' pruning."""
    runner = built["runner"]
    reader = runner._make_probe_reader("flat_obs")
    tgt = spark.read.parquet(runner._path("flat_obs"))
    victim = int(tgt.select("person_id").first()["person_id"])
    keys = spark.createDataFrame(
        [(None,), (victim,)], "person_id long"
    )
    hit = reader(keys, "person_id")
    want = tgt.filter(F.col("person_id") == victim).count()
    assert hit.count() == want and want > 0
    # all-null delta: nothing to probe, nothing read
    only_null = spark.createDataFrame([(None,)], "person_id long")
    assert reader(only_null, "person_id").count() == 0


def test_bloom_prunes_at_production_month_cardinality(spark, tmp_path):
    """r9 (VERDICT r8 item 3 done-bar): a month holding >=100k distinct
    persons must still prune person-keyed probes.  Under the old 2^17
    cap such a month saturated toward all-ones and pruned nothing
    (conservative but useless at the 100x target); the binary sidecar
    carries filters up to 2^23 bits (~500k keys at 16 bits/key)."""
    import pyspark.sql.functions as SF

    runner = PipelineRunner(spark, str(tmp_path / "store"), partitioned=True)
    n = 120_000
    big = spark.range(0, n).select(
        F.lit("2024-01").alias("p_month"),
        F.col("id").cast("long").alias("person_id"),
    )
    small = spark.range(n, n + 500).select(
        F.lit("2024-02").alias("p_month"),
        F.col("id").cast("long").alias("person_id"),
    )
    pdir = str(tmp_path / "staged")
    big.unionByName(small).write.partitionBy("p_month").parquet(pdir)

    blooms = runner._compute_month_blooms(pdir, "person_id", None)
    m_big = blooms["2024-01"]["m"]
    assert m_big > (1 << 17), "big month must outgrow the old cap"
    assert m_big <= runner._BLOOM_MAX_BITS

    # Probe 5 keys that live ONLY in the small month: the 120k-person
    # month must be pruned (it would have been kept by a saturated
    # filter), the small month kept.
    kdf = spark.createDataFrame(
        [(n + i,) for i in range(5)], "_k long"
    )
    keep = runner._bloom_hit_months(kdf, None, blooms)
    assert keep == {"2024-02"}, keep

    # And keys in the big month are still found (no false negatives).
    kdf2 = spark.createDataFrame([(77,), (99_000,)], "_k long")
    keep2 = runner._bloom_hit_months(kdf2, None, blooms)
    assert "2024-01" in keep2, keep2
    _ = SF  # silence unused-import lint paths


def test_bloom_build_staged_matches_collect_and_transfer(
    spark, tmp_path, monkeypatch
):
    """r10 (VERDICT r9 item 2): the Bloom BUILD stages its occupied-
    word aggregate as parquet and assembles each month's filter from
    one bulk columnar read — the driver's py4j row transfer must be
    O(months) (the approx-distinct sizing row per month), NOT
    O(months x occupied words), and the sidecar bytes must be
    IDENTICAL to the legacy row-collect build (kept behind
    _BLOOM_BUILD_COLLECT as the oracle)."""
    rows = [
        (f"2024-{m:02d}", pid)
        for m in (1, 2, 3)
        for pid in range(1, 200 + m * 37)
    ]
    df = spark.createDataFrame(rows, "p_month string, person_id long")
    d = str(tmp_path / "staged")
    df.write.partitionBy("p_month").parquet(d)
    r = PipelineRunner(spark, str(tmp_path / "store"), partitioned=True)

    counted = {"rows": 0}
    cls = type(df)  # the CONCRETE DataFrame class (classic/connect)
    real_collect = cls.collect

    def counting_collect(self):
        out = real_collect(self)
        counted["rows"] += len(out)
        return out

    monkeypatch.setattr(cls, "collect", counting_collect)
    staged = r._compute_month_blooms(d, "person_id", None)
    staged_rows = counted["rows"]

    monkeypatch.setattr(PipelineRunner, "_BLOOM_BUILD_COLLECT", True)
    counted["rows"] = 0
    legacy = r._compute_month_blooms(d, "person_id", None)
    legacy_rows = counted["rows"]

    assert staged == legacy, "staged build must be byte-identical"
    assert staged_rows == 3, (
        "staged build must collect exactly one sizing row per month",
        staged_rows,
    )
    assert legacy_rows > 3 * 10, (
        "oracle path no longer transfers word rows — spy broken?",
        legacy_rows,
    )
