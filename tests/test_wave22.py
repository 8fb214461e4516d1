"""Wave-22 operator unit tests: watershed forests, LISA quadrants on
a planted hot block, TextTiling boundary detection, and positional
phrase matching (incl. repeated-term coverage)."""


def test_watershed_two_basins(spark):
    from bano_spark.operators.raster import watershed_labels

    # V-shaped valley: z = |x - 2| along a 5-cell line plus a second
    # ridge at x=10..12 draining to x=10
    rows = [(x, 0, abs(x - 2)) for x in range(5)]
    rows += [(x, 0, x - 10) for x in range(10, 13)]
    dem = spark.createDataFrame(rows, "gx long, gy long, z long")
    out = {(r["gx"], r["gy"]): (r["sink_gx"], r["sink_gy"])
           for r in watershed_labels(dem).collect()}
    assert all(out[(x, 0)] == (2, 0) for x in range(5))
    assert all(out[(x, 0)] == (10, 0) for x in range(10, 13))


def test_watershed_long_chain_log_rounds(spark):
    from bano_spark.operators.raster import watershed_labels

    # a strictly descending 40-cell chain resolves (doubling would
    # need ~6 rounds; step-walking would need 40)
    dem = spark.createDataFrame(
        [(x, 0, 100 - x) for x in range(40)], "gx long, gy long, z long")
    out = watershed_labels(dem, max_rounds=10).collect()
    assert all((r["sink_gx"], r["sink_gy"]) == (39, 0) for r in out)


def test_local_moran_hot_block(spark):
    from bano_spark.operators.spatialstats import local_moran

    # 4x2 lattice, left 2 columns hot
    rows = [(x, y, 100 if x < 2 else 0)
            for x in range(4) for y in range(2)]
    cells = spark.createDataFrame(rows, "cx long, cy long, val long")
    out = {(r["cx"], r["cy"]): r for r in local_moran(cells).collect()}
    assert out[(0, 0)]["quadrant"] == "HH"
    assert out[(3, 0)]["quadrant"] == "LL"
    # boundary columns: hot cell with cold neighbor pulls lag down
    assert out[(0, 0)]["local_i"] > out[(1, 0)]["local_i"]


def test_texttiling_detects_vocab_shift(spark):
    from bano_spark.operators.textstats import texttiling

    a = "alpha beta gamma delta " * 6   # 24 tokens
    b = "omega psi chi phi " * 6        # 24 tokens
    docs = spark.createDataFrame([(1, a + b)], "doc_id long, text string")
    out = sorted(texttiling(docs, block=12, threshold=0.4).collect(),
                 key=lambda r: r["gap"])
    # 48 tokens -> 4 blocks -> 3 gaps; the middle gap (blocks 1|2)
    # crosses the vocabulary shift: sim 0, others sim 1
    sims = [r["sim"] for r in out]
    assert sims == [1.0, 0.0, 1.0]
    assert [r["is_boundary"] for r in out] == [False, True, False]


def test_phrase_search_positions_and_repeats(spark):
    from bano_spark.operators.search import phrase_search

    docs = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a a a b"), (3, "c b a")],
        "doc_id long, text string")
    phrases = spark.createDataFrame(
        [(1, "a b c"), (2, "a a")], "qid int, phrase string")
    out = {(r["qid"], r["doc_id"]): r["n_matches"]
           for r in phrase_search(docs, phrases).collect()}
    assert out[(1, 1)] == 2          # two full occurrences
    assert (1, 2) not in out and (1, 3) not in out
    assert out[(2, 2)] == 2          # "a a a" holds two "a a" starts
    assert (2, 1) not in out
