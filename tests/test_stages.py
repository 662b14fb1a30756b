"""Unit tests for dedup / textstats / similarity / multimodal stages."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from datamart_ray.stages.dedup import (
    _hash_tokens,
    jaccard,
    minhash_candidate_pairs,
    minhash_signature,
    _perm_seeds,
    shingle_hashes,
    simhash64,
)


def test_token_hash_stable_and_distinct():
    h1 = _hash_tokens(["alpha", "beta"])
    h2 = _hash_tokens(["alpha", "beta"])
    assert np.array_equal(h1, h2)
    assert h1[0] != h1[1]


def test_minhash_estimates_jaccard():
    seeds = _perm_seeds(256)
    a = shingle_hashes("the quick brown fox jumps over the lazy dog".split())
    b = shingle_hashes("the quick brown fox jumps over the lazy cat".split())
    est = float(
        (minhash_signature(a, seeds) == minhash_signature(b, seeds)).mean()
    )
    true = jaccard(a, b)
    assert abs(est - true) < 0.15


def test_simhash_similar_docs_close():
    base = "one two three four five six seven eight nine ten".split()
    variant = base[:-1] + ["eleven"]
    different = "totally unrelated words appear in this other document x".split()
    h_base, h_var, h_diff = simhash64(base), simhash64(variant), simhash64(different)
    d_near = bin(h_base ^ h_var).count("1")
    d_far = bin(h_base ^ h_diff).count("1")
    assert d_near < d_far


@pytest.fixture()
def dup_docs_ds(ray_session):
    texts = []
    for i in range(40):
        texts.append(f"unique document number {i} with content " + " ".join(
            f"w{i}{j}" for j in range(10)
        ))
    # plant a near-dup pair (docs 40, 41) and an exact dup pair (42, 43)
    near = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts.append(near + " lambda")
    texts.append(near + " mu")
    texts.append("exact duplicate content here shared verbatim by two docs")
    texts.append("exact duplicate content here shared verbatim by two docs")
    return rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    )


def test_minhash_lsh_finds_planted_dups(dup_docs_ds):
    pairs = minhash_candidate_pairs(dup_docs_ds, n_perm=64, bands=32)
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (42, 43) in got
    assert (40, 41) in got


def test_langid_batch_priority_and_und():
    from datamart_ray.stages.textstats import lang_id_batch

    t = pa.table(
        {
            "text": [
                "the cat and the dog is in the house",
                "le chat est dans la maison avec les autres",
                "xyzzy plugh qwerty",
                "",
            ]
        }
    )
    pred = lang_id_batch(t)
    assert list(pred) == ["en", "fr", "und", "und"]


def test_multimodal_stub_pipeline(ray_session):
    from datamart_ray.stages.multimodal import decode_images, image_features

    items = [
        {"item_id": i, "payload": bytes([i]) * 32, "mime": "image/fake"}
        for i in range(10)
    ]
    ds = rd.from_items(items)
    decoded = decode_images(ds).to_pandas()
    assert set(decoded.columns) == {"item_id", "mime", "width", "height", "ok"}
    assert decoded["ok"].all()
    # deterministic: same payload → same fake size
    again = decode_images(rd.from_items(items)).to_pandas()
    pd.testing.assert_frame_equal(
        decoded.sort_values("item_id").reset_index(drop=True),
        again.sort_values("item_id").reset_index(drop=True),
    )
    feats = image_features(rd.from_items(items), dim=8).to_pandas()
    assert len(feats) == 10
    v = np.array(feats["feature"].iloc[0])
    assert v.shape == (8,)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5


def test_knn_lsh_recall_vs_exact(ray_session):
    """LSH ANN must recover most of the exact top-k (banded OR recall)."""
    from datamart_ray.stages.similarity import knn_cosine, knn_lsh

    sf = "/root/testdata/sf0.001"
    exact = knn_cosine(sf, query_ids=(0, 1), k=5)
    approx = knn_lsh(sf, query_ids=(0, 1), k=5, n_bands=32, band_bits=6)
    got = set(zip(approx["query_id"], approx["neighbor_id"]))
    want = set(zip(exact["query_id"], exact["neighbor_id"]))
    recall = len(got & want) / len(want)
    assert recall >= 0.5, f"recall {recall}: {got} vs {want}"


def test_embedding_near_dups_runs(ray_session):
    from datamart_ray.stages.similarity import embedding_near_dups

    out = embedding_near_dups("/root/testdata/sf0.001", threshold=0.9)
    assert list(out.columns) == ["vec_a", "vec_b", "cosine"]
    if len(out):
        assert (out["cosine"] >= 0.9).all()
        assert (out["vec_a"] < out["vec_b"]).all()


def test_sources_convert_and_sidecar(ray_session, tmp_path):
    import json

    import pyarrow.parquet as pq
    import ray.data as rd

    from datamart_ray.sources import (
        convert_csv_to_parquet,
        detect_and_convert,
        write_with_metadata,
    )

    csv = tmp_path / "in.csv"
    csv.write_text("a,b\n1,x\n2,y\n")
    out = convert_csv_to_parquet(str(csv), str(tmp_path / "pq"))
    t = pq.read_table(out)
    assert t.num_rows == 2 and t.column_names == ["a", "b"]

    tsv = tmp_path / "in.tsv"
    tsv.write_text("a\tb\n3\tz\n")
    out2 = detect_and_convert(str(tsv), str(tmp_path / "pq2"))
    assert pq.read_table(out2).num_rows == 1

    ds = rd.from_items([{"x": 1}, {"x": 2}])
    d3 = write_with_metadata(ds, str(tmp_path / "meta_out"), "demo")
    doc = json.load(open(f"{d3}/datasetDoc.json"))
    assert doc["about"]["datasetName"] == "demo"
    assert doc["nb_rows"] == 2
    assert doc["columns"][0]["name"] == "x"


def test_registry():
    from datamart_ray import registry

    assert "q01_pricing_summary" in registry.list_stages()
    fn = registry.get_stage("knn_cosine")
    assert callable(fn)

    @registry.register_stage("my_custom_stage")
    def my_stage(sf_dir):
        return sf_dir

    assert registry.get_stage("my_custom_stage")("x") == "x"
    import pytest as _pytest

    with _pytest.raises(KeyError):
        registry.get_stage("nope_missing")


def test_minhash_custom_analyzer(dup_docs_ds):
    """ADVICE: a non-default analyzer must round-trip into the stage
    (Analyzer.to_kwargs, not __dict__ which carries _stem_cache)."""
    from datamart_ray.analyzer import Analyzer

    pairs = minhash_candidate_pairs(
        dup_docs_ds, n_perm=64, bands=32,
        analyzer=Analyzer(min_token_len=2),
    )
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (42, 43) in got


def test_lsh_bucket_cap_degenerate(ray_session):
    """A planted degenerate bucket (10k identical docs — mass-duplicated
    boilerplate) must complete with linear pair output, not O(n²)."""
    n = 10_000
    text = "identical boilerplate content repeated verbatim in every doc"
    ds = rd.from_items(
        [{"doc_id": i, "text": text} for i in range(n)]
    )
    pairs = minhash_candidate_pairs(ds, n_perm=64, bands=16, pair_cap=256)
    # star expansion: n-1 unique pairs, all anchored at the smallest id
    assert len(pairs) == n - 1
    assert (pairs["doc_a"] == 0).all()


def test_bucket_pairs_capped_unit():
    from datamart_ray.stages.dedup import _bucket_pairs_capped

    a, b = _bucket_pairs_capped(np.array([5, 3, 9]), cap=10)
    assert list(a) == [3, 3, 5] and list(b) == [5, 9, 9]
    a, b = _bucket_pairs_capped(np.arange(100), cap=50)
    assert len(a) == 99 and (a == 0).all()


def test_simhash_dup_pairs_verified(ray_session, tmp_path):
    """Shingle-simhash banding + exact-jaccard verify on planted dups."""
    import pyarrow.parquet as pq_

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    texts = [f"doc {i} " + " ".join(f"w{i}{j}" for j in range(30)) for i in range(30)]
    texts += [base + "lambda", base + "mu"]  # planted near-dup pair (30, 31)
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    d = tmp_path / "docs"
    d.mkdir()
    pq_.write_table(t, str(d / "documents.parquet"))
    out = __import__("datamart_ray.stages.dedup", fromlist=["simhash_dup_pairs"]).simhash_dup_pairs(str(d))
    assert list(out.columns) == ["doc_a", "doc_b", "jaccard"]
    got = set(zip(out["doc_a"], out["doc_b"]))
    assert (30, 31) in got
    assert (out["jaccard"] >= 0.5).all()


def test_ngram_jaccard_matches_minhash_verified(ray_session, tmp_path):
    """The n-gram inverted-index modality and MinHash-LSH verify against
    the same exact-Jaccard definition, so on a recall-complete fixture
    both produce the IDENTICAL verified pair list; sampling the shingle
    space yields a subset (never new pairs)."""
    import pyarrow.parquet as pq_

    from datamart_ray.stages.dedup import (
        minhash_near_dups,
        ngram_dedup_survivors,
        ngram_jaccard_near_dups,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    texts = [
        f"doc {i} " + " ".join(f"w{i}{j}" for j in range(30))
        for i in range(30)
    ]
    texts += [base + "lambda", base + "mu", base + "nu"]  # cluster 30-32
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    d = tmp_path / "docs"
    d.mkdir()
    pq_.write_table(t, str(d / "documents.parquet"))

    ng = ngram_jaccard_near_dups(str(d))
    mh = minhash_near_dups(str(d))
    assert ng.values.tolist() == mh.values.tolist()
    got = set(zip(ng["doc_a"], ng["doc_b"]))
    assert {(30, 31), (30, 32), (31, 32)} <= got

    sampled = ngram_jaccard_near_dups(str(d), sample_rate=0.3)
    assert set(zip(sampled["doc_a"], sampled["doc_b"])) <= got

    surv = ngram_dedup_survivors(str(d))
    assert surv.values.tolist() == [[31, 30], [32, 30]]


def test_rolling_fingerprints_matches_scalar_chain():
    """Vectorized segmented FNV fingerprint == the sequential scalar
    definition (seg-token segment digests chained per doc), including
    docs spanning multiple segments."""
    from datamart_ray.analyzer import Analyzer
    from datamart_ray.stages.dedup import _hash_tokens
    from datamart_ray.stages.textstats import (
        FNV_OFFSET,
        FNV_PRIME,
        rolling_fingerprints,
    )

    def scalar(tokens, seg):
        th = _hash_tokens(tokens)
        digests = []
        for i in range(0, len(th), seg):
            d = np.uint64(FNV_OFFSET)
            for h in th[i : i + seg]:
                d = d * FNV_PRIME ^ h
            digests.append(d)
        acc = np.uint64(FNV_OFFSET)
        for d in digests:
            acc = acc * FNV_PRIME ^ d
        return acc

    an = Analyzer()
    texts = [
        "one two three",
        "",
        "single",
        "a b c d e f g h i j k",
        " ".join(f"w{i}" for i in range(1000)),  # spans many segments
    ]
    lists = an.token_lists(pa.array(texts))
    for seg in (4, 256):
        got = rolling_fingerprints(lists, len(texts), seg=seg)
        for i, txt in enumerate(texts):
            assert got[i] == scalar(an.tokenize(txt), seg), (i, seg)
    # order sensitivity across a segment boundary
    a = an.token_lists(pa.array(["x y z w", "y x z w"]))
    fa = rolling_fingerprints(a, 2, seg=2)
    assert fa[0] != fa[1]


def test_popcount64():
    from datamart_ray.stages.dedup import popcount64

    x = np.array([0, 1, 3, 0xFFFFFFFFFFFFFFFF, 1 << 63], dtype=np.uint64)
    assert list(popcount64(x)) == [0, 1, 2, 64, 1]


def test_sketch_containment_close_to_exact(ray_session):
    from datamart_ray.pipelines.textjoin import (
        column_containment_scores,
        sketch_containment_scores,
    )

    sf = "/root/testdata/sf0.001"
    exact = column_containment_scores(sf)
    est = sketch_containment_scores(sf)
    m = exact.merge(est, on=["query_col", "candidate_col"], how="left")
    assert m["containment_est"].notna().all()
    assert (m["containment"] - m["containment_est"]).abs().max() < 0.1


def test_pivot_detection_and_unpivot(ray_session, tmp_path):
    from datamart_ray.sources.convert import (
        detect_and_convert_pivoted,
        detect_pivoted_columns,
    )
    import pyarrow.parquet as pq_

    # wide date-pivot: 2 id columns + 4 date columns
    assert detect_pivoted_columns(
        ["station", "metric", "2020-01-01", "2020-01-02",
         "2020-01-03", "2020-01-04"]
    ) == [0, 1]
    # ordinary table: too many non-date names
    assert detect_pivoted_columns(["a", "b", "c", "2020-01-01"]) is None
    assert detect_pivoted_columns(["a", "2020-01-01"]) is None

    csv = tmp_path / "wide.csv"
    csv.write_text(
        "station,2020-01-01,2020-01-02,2020-01-03\n"
        "s1,1.0,2.0,3.0\n"
        "s2,4.0,5.0,6.0\n"
    )
    out = detect_and_convert_pivoted(str(csv), str(tmp_path / "o"))
    t = pq_.read_table(out).to_pandas().sort_values(
        ["station", "date"]
    ).reset_index(drop=True)
    assert list(t.columns) == ["station", "date", "value"]
    assert len(t) == 6
    assert t[(t["station"] == "s2") & (t["date"] == "2020-01-02")][
        "value"
    ].iloc[0] == 5.0


def test_d3m_metadata_coltypes_golden():
    from datamart_ray.sources.convert import d3m_metadata

    meta = {
        "name": "demo",
        "columns": [
            {"name": "flag", "structural_type": "text",
             "semantic_types": ["boolean", "categorical"]},
            {"name": "seg", "structural_type": "text",
             "semantic_types": ["categorical"]},
            {"name": "when", "structural_type": "text",
             "semantic_types": ["date_time"]},
            {"name": "n", "structural_type": "integer",
             "semantic_types": []},
            {"name": "x", "structural_type": "float",
             "semantic_types": []},
            {"name": "label", "structural_type": "text",
             "semantic_types": []},
        ],
    }
    doc = d3m_metadata("ds1", meta, need_d3mindex=True)
    cols = doc["dataResources"][0]["columns"]
    got = [(c["colName"], c["colType"], c["role"]) for c in cols]
    assert got == [
        ("d3mIndex", "integer", ["index"]),
        ("flag", "boolean", ["attribute"]),
        ("seg", "categorical", ["attribute"]),
        ("when", "dateTime", ["attribute"]),
        ("n", "integer", ["attribute"]),
        ("x", "real", ["attribute"]),
        ("label", "string", ["attribute"]),
    ]
    assert doc["about"]["datasetSchemaVersion"] == "4.0.0"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        d3m_metadata("ds1", meta, version="9.9")


def test_write_d3m_dataset(ray_session, tmp_path):
    import json

    from datamart_ray.sources.convert import write_d3m_dataset

    ds = rd.from_items([{"n": 1, "s": "a"}, {"n": 2, "s": "b"}])
    out = write_d3m_dataset(
        ds, str(tmp_path / "d3m"), "demo",
        [
            {"name": "n", "structural_type": "integer",
             "semantic_types": []},
            {"name": "s", "structural_type": "text",
             "semantic_types": ["categorical"]},
        ],
    )
    doc = json.load(open(f"{out}/datasetDoc.json"))
    assert doc["dataResources"][0]["columns"][1]["colType"] == "categorical"
    import pyarrow.dataset as pads

    assert pads.dataset(f"{out}/tables").count_rows() == 2


def test_multimodal_real_codecs(ray_session):
    """PPM images and WAV audio decode for REAL (no external deps)."""
    from datamart_ray.stages.multimodal import (
        decode_audio,
        decode_images,
        decode_netpbm,
        encode_ppm,
        encode_wav,
        image_features,
    )

    rng = np.random.default_rng(7)
    items = []
    for i in range(6):
        pix = rng.integers(0, 256, size=(8 + i, 12, 3), dtype=np.uint8)
        items.append(
            {"item_id": i, "payload": encode_ppm(pix), "mime": "image/x-ppm"}
        )
    # round-trip sanity
    w, h, pix0 = decode_netpbm(items[0]["payload"])
    assert (w, h) == (12, 8)
    out = decode_images(rd.from_items(items)).to_pandas()
    assert out["ok"].all()
    assert set(out["width"]) == {12}
    assert sorted(out["height"]) == [8, 9, 10, 11, 12, 13]
    # content-based features: identical image → identical feature,
    # different image → different feature
    feats = image_features(rd.from_items(items), dim=16).to_pandas()
    f0 = np.array(feats[feats["item_id"] == 0]["feature"].iloc[0])
    assert abs(np.linalg.norm(f0) - 1.0) < 1e-5
    again = image_features(rd.from_items(items), dim=16).to_pandas()
    f0b = np.array(again[again["item_id"] == 0]["feature"].iloc[0])
    assert np.allclose(f0, f0b)

    t = np.arange(1600)
    tone = (np.sin(2 * np.pi * 440 * t / 16000) * 10000).astype(np.int16)
    audio_items = [
        {"item_id": 0, "payload": encode_wav(tone), "mime": "audio/wav"},
        {"item_id": 1, "payload": b"not a wav", "mime": "audio/wav"},
    ]
    a = decode_audio(rd.from_items(audio_items)).to_pandas().sort_values(
        "item_id"
    )
    assert bool(a.iloc[0]["ok"]) and not bool(a.iloc[1]["ok"])
    assert a.iloc[0]["sample_rate"] == 16000
    assert a.iloc[0]["n_samples"] == 1600
    # RMS of a sine at amplitude A is A/sqrt(2)
    assert abs(a.iloc[0]["rms"] - 10000 / np.sqrt(2)) < 100


def test_sliding_window_counts_small(ray_session, tmp_path):
    """Window semantics: RANGE frame, trailing 1h, ts-peers inclusive."""
    import pyarrow.parquet as pq_

    from datamart_ray.pipelines.window import sliding_window_counts

    base = np.datetime64("2020-01-01T00:00:00", "us")
    mins = lambda m: base + np.timedelta64(m * 60, "s")
    rows = [
        # user 1: events at 0, 30, 59, 61, 200 minutes
        (0, 1, mins(0)), (1, 1, mins(30)), (2, 1, mins(59)),
        (3, 1, mins(61)), (4, 1, mins(200)),
        # user 2: two events at the SAME timestamp (peers both count)
        (5, 2, mins(10)), (6, 2, mins(10)),
    ]
    t = pa.table(
        {
            "event_id": [r[0] for r in rows],
            "user_id": [r[1] for r in rows],
            "ts": pa.array([r[2] for r in rows], type=pa.timestamp("us")),
        }
    )
    d = tmp_path / "ev"
    d.mkdir()
    pq_.write_table(t, str(d / "events.parquet"))
    out = sliding_window_counts(str(d))
    got = dict(zip(out["event_id"], out["n_window"]))
    # 60-min window inclusive: at 61min, events at 1..61 → 30,59,61
    assert got == {0: 1, 1: 2, 2: 3, 3: 3, 4: 1, 5: 2, 6: 2}


def test_sessionize_gap_semantics(ray_session, tmp_path):
    """Strict-gap sessionization: gap == threshold stays in-session,
    gap > threshold splits; per-user 0-based session ordinals."""
    import pyarrow.parquet as pq_

    from datamart_ray.pipelines.window import sessionize

    base = np.datetime64("2020-01-01T00:00:00", "us")
    mins = lambda m: base + np.timedelta64(m * 60, "s")
    rows = [
        # user 1: 0, 30 (gap == 30min stays), 90 (gap 60 > 30 splits)
        (0, 1, mins(0)), (1, 1, mins(30)), (2, 1, mins(90)),
        # user 2: single event
        (3, 2, mins(5)),
        # user 3: same-timestamp pair then far event
        (4, 3, mins(10)), (5, 3, mins(10)), (6, 3, mins(500)),
    ]
    t = pa.table(
        {
            "event_id": [r[0] for r in rows],
            "user_id": [r[1] for r in rows],
            "ts": pa.array([r[2] for r in rows], type=pa.timestamp("us")),
        }
    )
    d = tmp_path / "ev"
    d.mkdir()
    pq_.write_table(t, str(d / "events.parquet"))
    out = sessionize(str(d), gap_sec=1800)
    got = [
        [r.user_id, r.session_id, r.n_events,
         np.datetime64(r.start_ts, "m").astype(int) % (24 * 60),
         np.datetime64(r.end_ts, "m").astype(int) % (24 * 60)]
        for r in out.itertuples()
    ]
    assert got == [
        [1, 0, 2, 0, 30],
        [1, 1, 1, 90, 90],
        [2, 0, 1, 5, 5],
        [3, 0, 2, 10, 10],
        [3, 1, 1, 500, 500],
    ]


def test_knn_ivf_matches_exact(ray_session):
    from datamart_ray.stages.similarity import knn_cosine, knn_ivf

    sf = "/root/testdata/sf0.001"
    exact = knn_cosine(sf, query_ids=(0, 1), k=5).reset_index(drop=True)
    ivf = knn_ivf(sf, query_ids=(0, 1), k=5).reset_index(drop=True)
    assert exact.equals(ivf)


def test_untyped_vote_edges():
    """Structural regex vote edge semantics (reference
    profile_types.py:121-137 + 2% tolerance)."""
    from datamart_ray.pipelines.untyped import _count_batch

    # all-empty column → 'missing' is decided by n_empty == n_total
    c = _count_batch(pa.array(["", "", None], type=pa.string()))
    assert c["n_empty"] == 3 and c["n_total"] == 3

    # exclusive chain: "4.0" is an INTEGER (reference _re_int), never float
    c = _count_batch(pa.array(["4.0", "7.000", "3.5", ".5", "1e9"]))
    assert c["n_int"] == 2
    assert c["n_float"] == 2  # 3.5 and .5 ("1e9" needs a decimal point)

    # bool is counted independently of the int chain ("0"/"1" are both)
    c = _count_batch(pa.array(["0", "1", "yes", "No", "maybe"]))
    assert c["n_int"] == 2 and c["n_bool"] == 4

    # WKT point with comma goes to other_point, not point
    c = _count_batch(
        pa.array(["POINT (1.5 2.5)", "POINT (1.5, 2.5)"])
    )
    assert c["n_point"] == 1 and c["n_other_point"] == 1

    # free text needs >= 3 whitespace runs
    c = _count_batch(
        pa.array(["one two three four", "one two three", "word"])
    )
    assert c["n_text"] == 1


def test_multimodal_resize_and_frame_sample(ray_session):
    from datamart_ray.stages.multimodal import (
        decode_netpbm,
        encode_ppm,
        resize_images,
        sample_frames,
    )

    rng = np.random.default_rng(3)
    frames = [
        encode_ppm(rng.integers(0, 256, size=(10, 8, 3), dtype=np.uint8))
        for _ in range(5)
    ]
    items = [
        {"item_id": 0, "payload": frames[0], "mime": "image/x-ppm"},
        {"item_id": 1, "payload": b"junk", "mime": "image/x-ppm"},
    ]
    out = resize_images(rd.from_items(items), 4, 6).to_pandas()
    row0 = out[out["item_id"] == 0].iloc[0]
    assert bool(row0["ok"])
    w, h, pix = decode_netpbm(row0["payload"])
    assert (w, h) == (4, 6) and pix.shape == (6, 4, 3)
    assert not bool(out[out["item_id"] == 1].iloc[0]["ok"])

    video = [{"item_id": 7, "payload": b"".join(frames), "mime": "video/x-ppm-seq"}]
    sampled = sample_frames(rd.from_items(video), stride=2).to_pandas()
    assert list(sampled["frame_index"]) == [0, 2, 4]
    # each sampled frame is itself a decodable image
    for f in sampled["frame"]:
        assert decode_netpbm(f) is not None


def test_manual_annotation_overrides_profile(ray_session):
    """Reference manual_annotations hook (lib_profiler core.py:269-281;
    profile_types.py:150-184): an annotated column skips the regex vote,
    takes the manual structural/semantic types verbatim, and computes the
    unclean ratio against the MANUAL type."""
    from datamart_ray.pipelines.untyped import profile_untyped

    sf = "/root/testdata/sf0.001"
    base = profile_untyped(sf).set_index("column")
    assert base.loc["cust_id", "structural_type"] == "integer"
    assert base.loc["flag", "structural_type"] == "text"

    ann = {
        "columns": [
            {
                "name": "cust_id",
                "structural_type": "text",
                "semantic_types": ["categorical"],
            },
            {
                "name": "flag",
                "structural_type": "integer",
                "semantic_types": [],
            },
        ]
    }
    over = profile_untyped(sf, manual_annotations=ann).set_index("column")
    # override flips the structural type and the semantic list
    assert over.loc["cust_id", "structural_type"] == "text"
    assert over.loc["cust_id", "semantic_types"] == "categorical"
    import numpy as np
    assert np.isnan(over.loc["cust_id", "unclean_ratio"])  # text: no ratio
    # unclean ratio is computed against the MANUAL type: flag's yes/no
    # values are 100% unclean as integers
    assert over.loc["flag", "structural_type"] == "integer"
    assert over.loc["flag", "unclean_ratio"] == 1.0
    # unannotated columns are untouched
    unann = [c for c in base.index if c not in ("cust_id", "flag")]
    assert over.loc[unann].equals(base.loc[unann])


def test_ivf_distributed_kmeans_block_invariant(ray_session):
    """The distributed Lloyd trainer's fixed-point partial sums make the
    centroids BIT-IDENTICAL under different block structures (the
    multi-node invariance property), and the quantizer is usable: unit
    norm, k clusters, and knn via these centroids still matches exact."""
    import numpy as np

    from datamart_ray.stages.similarity import ivf_centroids_distributed

    sf = "/root/testdata/sf0.001"
    c2 = ivf_centroids_distributed(sf, repartition_blocks=2)
    c8 = ivf_centroids_distributed(sf, repartition_blocks=8)
    assert c2.shape == (16, c2.shape[1])
    assert np.array_equal(c2, c8)  # bit-identical across block layouts
    assert np.allclose(np.linalg.norm(c2, axis=1), 1.0)


def test_connected_components_path_graph(ray_session):
    """A chain 1-5-9, 9-3 plus an isolated pair (20,21): every node
    converges to its component minimum; transitive closure crosses the
    chain even though (1,3) was never a pair."""
    from datamart_ray.stages.dedup import connected_components_ds

    pairs = rd.from_items(
        [
            {"doc_a": 5, "doc_b": 9},
            {"doc_a": 1, "doc_b": 5},
            {"doc_a": 3, "doc_b": 9},
            {"doc_a": 20, "doc_b": 21},
        ]
    )
    lab = connected_components_ds(pairs).to_pandas()
    got = dict(zip(lab["doc"], lab["lab"]))
    assert got == {1: 1, 5: 1, 9: 1, 3: 1, 20: 20, 21: 20}


def test_minhash_dedup_survivors_planted(tmp_path, ray_session):
    """Survivor manifest over a small corpus: exact dup pair (42,43) and
    near-dup pair (40,41) each remove the larger id; a transitive triple
    removes both copies in favor of the smallest."""
    import pyarrow.parquet as pq_

    from datamart_ray.stages.dedup import minhash_dedup_survivors

    texts = []
    for i in range(40):
        texts.append(
            f"unique document number {i} with content "
            + " ".join(f"w{i}{j}" for j in range(10))
        )
    near = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts.append(near + " lambda")   # 40
    texts.append(near + " mu")       # 41
    dup = "exact duplicate content here shared verbatim by two docs"
    texts.append(dup)                # 42
    texts.append(dup)                # 43
    texts.append(dup + " trailing")  # 44 — chains to 42/43 transitively
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
        }
    )
    pq_.write_table(t, str(tmp_path / "documents.parquet"))
    out = minhash_dedup_survivors(str(tmp_path), threshold=0.5, bands=32)
    got = dict(zip(out["doc_id"], out["kept_id"]))
    assert got[41] == 40
    assert got[43] == 42
    assert got[44] == 42  # transitive: kept is the component MINIMUM
    assert 40 not in got and 42 not in got
    # the distributed label-propagation path (cc_driver_cap=0 forces it)
    # must produce the identical manifest
    out_dist = minhash_dedup_survivors(
        str(tmp_path), threshold=0.5, bands=32, cc_driver_cap=0
    )
    pd.testing.assert_frame_equal(out, out_dist)
    # the SimHash modality verifies the same exact (jaccard>=0.5) graph,
    # so its removal manifest must be identical (recall-complete bands)
    from datamart_ray.stages.dedup import simhash_dedup_survivors

    out_sim = simhash_dedup_survivors(str(tmp_path), threshold=0.5)
    pd.testing.assert_frame_equal(out, out_sim)


def test_repetition_scores_degenerate_and_exact(tmp_path, ray_session):
    """Degenerate docs (empty, one token) are absent; a fully repeated
    doc scores dup=top=high; counts match a hand computation."""
    import pyarrow.parquet as pq_

    from datamart_ray.stages.textstats import repetition_scores

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "text": pa.array(
                [
                    "",                      # 0: no tokens
                    "single",                # 1: one token, no bigrams
                    "a b a b a b",           # 2: bigrams ab,ba,ab,ba,ab
                    "x y z",                 # 3: bigrams xy,yz — all distinct
                ]
            ),
        }
    )
    pq_.write_table(t, str(tmp_path / "documents.parquet"))
    out = repetition_scores(str(tmp_path))
    assert out["doc_id"].tolist() == [2, 3]
    r2 = out[out["doc_id"] == 2].iloc[0]
    # 5 bigram positions, 2 distinct, top count 3 ("a b")
    assert r2["n_bigrams"] == 5
    assert r2["dup_bigram_frac"] == 0.6
    assert r2["top_bigram_frac"] == 0.6
    r3 = out[out["doc_id"] == 3].iloc[0]
    assert r3["n_bigrams"] == 2 and r3["dup_bigram_frac"] == 0.0


def test_knn_ivf_distributed_trainer_matches(ray_session):
    """trainer='distributed' (fixed-point Lloyd + persisted artifact)
    returns the same exact-rescored top-k as the driver trainer on the
    recall-complete fixtures; a second call hits the centroid artifact."""
    import os

    from datamart_ray.stages.similarity import (
        _centroid_artifact_path,
        knn_ivf,
    )

    sf = "/root/testdata/sf0.001"
    a = knn_ivf(sf, query_ids=(0, 1), k=5, trainer="driver")
    b = knn_ivf(sf, query_ids=(0, 1), k=5, trainer="distributed")
    pd.testing.assert_frame_equal(a, b)
    path = f"{sf}/embeddings.parquet"
    import pyarrow.parquet as pq_

    n = pq_.ParquetFile(path).metadata.num_rows
    from datamart_ray.stages.similarity import IVF_TRAIN_BUDGET

    stride = max(1, -(-n // IVF_TRAIN_BUDGET))
    art = _centroid_artifact_path(path, 16, 10, stride, variant="dist")
    assert os.path.exists(art)
    c = knn_ivf(sf, query_ids=(0, 1), k=5, trainer="distributed")
    pd.testing.assert_frame_equal(b, c)
    with pytest.raises(ValueError, match="trainer"):
        knn_ivf(sf, trainer="gpu")


def test_union_find_min_removed_random_graphs():
    """Driver union-find vs a BFS reference on random graphs: the
    removal manifest must map every non-minimum node of each component
    to that component's minimum."""
    from collections import deque

    from datamart_ray.stages.dedup import _union_find_min_removed

    rng = np.random.default_rng(11)
    for trial in range(25):
        n_nodes = int(rng.integers(2, 60))
        n_edges = int(rng.integers(1, 80))
        a = rng.integers(0, n_nodes, n_edges).astype(np.int64)
        b = rng.integers(0, n_nodes, n_edges).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        if not a.size:
            continue
        got = _union_find_min_removed(a, b)
        # BFS reference
        adj: dict[int, set[int]] = {}
        for x, y in zip(a.tolist(), b.tolist()):
            adj.setdefault(x, set()).add(y)
            adj.setdefault(y, set()).add(x)
        want = {}
        seen: set[int] = set()
        for start in sorted(adj):
            if start in seen:
                continue
            comp = []
            q = deque([start])
            seen.add(start)
            while q:
                u = q.popleft()
                comp.append(u)
                for v in adj[u]:
                    if v not in seen:
                        seen.add(v)
                        q.append(v)
            m = min(comp)
            for u in comp:
                if u != m:
                    want[u] = m
        assert dict(zip(got["doc_id"], got["kept_id"])) == want, trial


def test_stratified_sample_rates_and_stability(ray_session, tmp_path):
    """Per-stratum keep fraction tracks the configured rate, the sample
    is deterministic, and it is IDENTICAL at different block layouts
    (the property ds.random_sample cannot give)."""
    from datamart_ray.stages.sampling import stratified_sample_ds

    langs = ["en", "de", "fr"]
    t = pa.table(
        {
            "doc_id": list(range(12000)),
            "lang": [langs[i % 3] for i in range(12000)],
        }
    )
    rates = {"en": 0.5, "de": 0.25}
    got = {}
    for blocks in (2, 37):
        ds = rd.from_arrow(t).repartition(blocks)
        out = (
            stratified_sample_ds(ds, rates, default_rate=0.1)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        got[blocks] = out
    assert got[2].values.tolist() == got[37].values.tolist()
    frac = got[2].groupby("lang").size() / 4000.0
    assert abs(frac["en"] - 0.5) < 0.03
    assert abs(frac["de"] - 0.25) < 0.03
    assert abs(frac["fr"] - 0.1) < 0.03


def test_packed_windows_matches_scalar_prefix_sum(ray_session, tmp_path):
    """Distributed prefix-scan packing == the sequential definition."""
    import pyarrow.parquet as pq_

    from datamart_ray.analyzer import Analyzer
    from datamart_ray.stages.packing import packed_windows

    rng = np.random.default_rng(7)
    n = 400
    texts = [
        " ".join(f"tok{j}" for j in range(int(rng.integers(0, 40))))
        for _ in range(n)
    ]
    t = pa.table({"doc_id": list(range(n)), "text": texts})
    d = tmp_path / "docs"
    d.mkdir()
    pq_.write_table(t, str(d / "documents.parquet"))

    W = 64
    out = packed_windows(str(d), window=W)

    an = Analyzer()
    cnts = [len(an.token_lists(pa.array([x]))[0]) for x in texts]
    want: dict[int, list[int]] = {}
    pos = 0
    for c in cnts:
        wid = pos // W
        nd, nt = want.setdefault(wid, [0, 0])
        want[wid] = [nd + 1, nt + c]
        pos += c
    want_rows = [[k, v[0], v[1]] for k, v in sorted(want.items())]
    assert out.values.tolist() == want_rows


def test_contamination_planted_leak(ray_session, tmp_path):
    """A verbatim copy of a benchmark doc reports n_shared == the
    benchmark doc's full distinct-shingle count; disjoint docs are
    absent from the flag list."""
    import pyarrow.parquet as pq_

    from datamart_ray.stages.decontaminate import (
        _doc_shingles,
        contamination_counts,
    )

    bench_text = "alpha beta gamma delta epsilon zeta eta theta " * 3
    texts = [bench_text] + [
        " ".join(f"only{i}x{j}" for j in range(20)) for i in range(1, 20)
    ]
    texts.append(bench_text)  # doc 20 leaks benchmark doc 0 verbatim
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    d = tmp_path / "docs"
    d.mkdir()
    pq_.write_table(t, str(d / "documents.parquet"))

    out = contamination_counts(str(d), benchmark_ids=(0,))
    v, _ = _doc_shingles(pa.array([bench_text]), 3)
    want_n = len(np.unique(v))
    flagged = dict(zip(out["doc_id"], out["n_shared"]))
    assert flagged[20] == want_n
    assert flagged[0] == want_n  # the benchmark doc itself
    assert set(flagged) == {0, 20}


def test_rare_token_ratio_planted(ray_session, tmp_path):
    """A token appearing in <10% of docs counts as rare; common tokens
    do not; empty docs are excluded."""
    import pyarrow.parquet as pq_

    from datamart_ray.stages.textstats import rare_token_ratio

    texts = ["common words here"] * 18
    texts.append("common words oddity")  # 'oddity' df=1 < 2 (10% of 20)
    texts.append("")
    t = pa.table({"doc_id": list(range(20)), "text": texts})
    d = tmp_path / "docs"
    d.mkdir()
    pq_.write_table(t, str(d / "documents.parquet"))

    out = rare_token_ratio(str(d))
    assert len(out) == 19  # empty doc dropped
    flagged = out[out["n_rare"] > 0]
    assert flagged["doc_id"].tolist() == [18]
    assert flagged["n_rare"].tolist() == [1]
    assert flagged["rare_ratio"].tolist() == [0.3333]


def test_pii_redaction_planted(ray_session, tmp_path):
    """Emails/IPs/phones are counted and replaced class-by-class;
    PII-free text passes through byte-identical with zero counts."""
    import pyarrow.parquet as pq_

    from datamart_ray.stages.redact import redact_dataset

    import ray.data as rd_

    texts = [
        "mail me at jane.doe+x@sub.example.org or bob@ex.io today",
        "server 192.168.0.1 and 10.255.3.99 timed out",
        "call 555-867-5309 re: 123-456-7890",
        "nothing sensitive here at all",
        "mix a@b.co 1.2.3.4 999-111-2222 end",
    ]
    t = pa.table({"doc_id": list(range(5)), "text": texts})
    d = tmp_path / "docs"
    d.mkdir()
    pq_.write_table(t, str(d / "documents.parquet"))
    ds = rd_.read_parquet(str(d / "documents.parquet"))
    out = (
        redact_dataset(ds, "text")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_email"].tolist() == [2, 0, 0, 0, 1]
    assert out["n_ip"].tolist() == [0, 2, 0, 0, 1]
    assert out["n_phone"].tolist() == [0, 0, 2, 0, 1]
    assert out["text"][0] == "mail me at <EMAIL> or <EMAIL> today"
    assert out["text"][1] == "server <IP> and <IP> timed out"
    assert out["text"][2] == "call <PHONE> re: <PHONE>"
    assert out["text"][3] == texts[3]
    assert out["text"][4] == "mix <EMAIL> <IP> <PHONE> end"


def test_knn_label_filtered_predicate(ray_session):
    """Filtered ANN: every neighbor carries the predicate label, and the
    result equals brute-force top-k over the filtered subset."""
    import duckdb

    from datamart_ray.stages.similarity import (
        knn_label_filtered,
        knn_label_filtered_sql,
    )

    sf = "/root/testdata/sf0.001"
    out = knn_label_filtered(sf, query_ids=(0, 1), k=3, label=2)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf}/embeddings.parquet')"
    )
    want = con.execute(
        knn_label_filtered_sql(query_ids=(0, 1), k=3, label=2)
    ).df()
    want = want.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True]
    ).reset_index(drop=True)
    assert out.values.tolist() == want.values.tolist()
    labels = dict(
        con.execute("SELECT vec_id, label FROM embeddings").fetchall()
    )
    assert all(labels[n] == 2 for n in out["neighbor_id"])


def test_pii_scrub_planted(ray_session):
    """Planted emails/URLs/IPs are counted and redacted in pinned order
    (URL first: an email inside a URL redacts as part of the URL)."""
    from datamart_ray.stages.pii import scrub_pii_ds

    rows = [
        {"doc_id": 0, "text": "mail me at jane.doe+x@example.co.uk now"},
        {"doc_id": 1, "text": "see https://a.b/c?u=bob@x.com and more"},
        {"doc_id": 2, "text": "host 192.168.0.1 and 10.0.0.255 up"},
        {"doc_id": 3, "text": "clean document, nothing to scrub"},
        {"doc_id": 4, "text": None},
    ]
    out = (
        scrub_pii_ds(rd.from_items(rows))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["text"][0] == "mail me at [EMAIL] now"
    # the email-shaped span inside the URL is consumed by [URL]
    assert out["text"][1] == "see [URL] and more"
    assert out["n_emails"][1] == 0 and out["n_urls"][1] == 1
    assert out["text"][2] == "host [IP] and [IP] up"
    assert out["n_ips"][2] == 2
    assert out["text"][3] == rows[3]["text"]
    assert (
        out[["n_urls", "n_emails", "n_ips"]].to_numpy().sum(axis=1)
        == [1, 1, 2, 0, 0]
    ).all()


def test_pii_scrub_matches_duckdb_regexp(ray_session, tmp_path):
    """The Arrow kernels and DuckDB regexp_replace/'g' agree on planted
    PII — the twin an operator over a PII-bearing corpus would use."""
    import duckdb
    import pyarrow.parquet as pq_

    from datamart_ray.stages.pii import (
        EMAIL_RE,
        IPV4_RE,
        URL_RE,
        scrub_pii,
    )

    texts = [
        "a@b.io writes to c.d@e.org daily",
        "fetch http://x.y/z then https://q.r/s?t=u@v.wx",
        "ping 1.2.3.4 from 255.255.255.0",
        "plain",
    ]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    d = tmp_path / "docs"
    d.mkdir()
    pq_.write_table(t, str(d / "documents.parquet"))

    got = scrub_pii(str(d))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    want = con.execute(f"""
        WITH s1 AS (
            SELECT doc_id,
                   len(regexp_extract_all(text, '{URL_RE}')) AS n_urls,
                   regexp_replace(text, '{URL_RE}', '[URL]', 'g') AS t1
            FROM documents
        ),
        s2 AS (
            SELECT doc_id, n_urls,
                   len(regexp_extract_all(t1, '{EMAIL_RE}')) AS n_emails,
                   regexp_replace(t1, '{EMAIL_RE}', '[EMAIL]', 'g') AS t2
            FROM s1
        )
        SELECT doc_id, n_urls, n_emails,
               len(regexp_extract_all(t2, '{IPV4_RE}')) AS n_ips,
               length(regexp_replace(t2, '{IPV4_RE}', '[IP]', 'g'))
                   AS clean_len
        FROM s2 ORDER BY doc_id
    """).df()
    assert got[["doc_id", "n_urls", "n_emails", "n_ips", "clean_len"]]\
        .values.tolist() == want.values.tolist()


def _write_min_xlsx(path):
    """A minimal hand-built OOXML workbook: shared strings, inline
    strings, numbers, booleans, a skipped cell, and rich-text runs."""
    import zipfile

    ct = """<?xml version="1.0"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
 <Default Extension="xml" ContentType="application/xml"/>
 <Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
</Types>"""
    wb = """<?xml version="1.0"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheets><sheet name="Sheet1" sheetId="1"/></sheets></workbook>"""
    ss = """<?xml version="1.0"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
 <si><t>name</t></si><si><t>alpha</t></si>
 <si><r><t>be</t></r><r><t>ta</t></r></si></sst>"""
    sheet = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="inlineStr"><is><t>score</t></is></c><c r="C1" t="inlineStr"><is><t>ok</t></is></c></row>
  <row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2"><v>1.5</v></c><c r="C2" t="b"><v>1</v></c></row>
  <row r="3"><c r="A3" t="s"><v>2</v></c><c r="C3" t="b"><v>0</v></c></row>
 </sheetData></worksheet>"""
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", ct)
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/sharedStrings.xml", ss)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def test_xlsx_reader_and_detect(tmp_path):
    """S9: the dependency-free xlsx converter reads shared/inline
    strings, numbers, bools, rich-text runs and sparse rows; the format
    dispatcher routes .xlsx to it."""
    import pyarrow.parquet as pq_

    from datamart_ray.sources import detect_and_convert
    from datamart_ray.sources.xlsx import convert_xlsx_to_parquet

    x = tmp_path / "book.xlsx"
    _write_min_xlsx(str(x))
    out = convert_xlsx_to_parquet(str(x), str(tmp_path / "pq"))
    t = pq_.read_table(f"{out}/data.parquet")
    assert t.column_names == ["name", "score", "ok"]
    assert t["name"].to_pylist() == ["alpha", "beta"]
    assert t["score"].to_pylist() == [1.5, None]
    assert t["ok"].to_pylist() == [True, False]
    assert t.schema.field("score").type == "double"
    assert str(t.schema.field("ok").type) == "bool"

    out2 = detect_and_convert(str(x), str(tmp_path / "pq2"))
    assert pq_.read_table(f"{out2}/data.parquet").num_rows == 2


def test_attach_pair_payloads_slow_path_equals_fast(ray_session, tmp_path):
    """The above-cap distributed path (shard dedupe + semi-filter +
    double hash join) must produce the same verified pairs as the
    broadcast fast path."""
    import pyarrow.parquet as pq_

    from datamart_ray.stages.dedup import (
        _pair_jaccard_kernel,
        _ShingleSetStage,
        attach_pair_payloads,
        minhash_candidate_pairs_ds,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    texts = [
        f"doc {i} " + " ".join(f"w{i}{j}" for j in range(30))
        for i in range(30)
    ]
    texts += [base + "lambda", base + "mu", base + "nu"]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    d = tmp_path / "docs"
    d.mkdir()
    path = str(d / "documents.parquet")
    pq_.write_table(t, path)

    outs = {}
    for cap, label in ((2_000_000, "fast"), (0, "slow")):
        cand = minhash_candidate_pairs_ds(
            rd.read_parquet(path, columns=["doc_id", "text"])
        )
        res = attach_pair_payloads(
            cand,
            rd.read_parquet(path, columns=["doc_id", "text"]),
            _pair_jaccard_kernel(0.5),
            payload_stage=_ShingleSetStage("doc_id", "text", 3, {}),
            pair_driver_cap=cap,
        )
        outs[label] = (
            res.to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
    assert outs["fast"].values.tolist() == outs["slow"].values.tolist()
    assert len(outs["fast"]) >= 3  # the planted 3-clique


def test_rescore_slow_path_equals_fast(ray_session):
    """ANN rescore: the above-cap distributed join path must equal the
    driver-planned fast path."""
    import pyarrow.parquet as pq_

    from datamart_ray.stages.similarity import (
        _distributed_rescore_ds,
        _to_matrix,
    )

    sf = "/root/testdata/sf0.001"
    path = f"{sf}/embeddings.parquet"
    qt = pq_.read_table(path, columns=["vec_id", "embedding"]).slice(0, 2)
    q_ids = qt["vec_id"].to_numpy(zero_copy_only=False)
    Q = _to_matrix(qt["embedding"])
    # candidate pairs: queries x a fixed id range (with duplicates to
    # exercise dedupe on both paths)
    items = [
        {"query_id": int(q), "cand_id": c}
        for q in q_ids
        for c in list(range(10, 40)) + list(range(10, 20))
        if c != int(q)
    ]
    outs = {}
    for cap, label in ((500_000, "fast"), (0, "slow")):
        cand = rd.from_items(items)
        outs[label] = _distributed_rescore_ds(
            path, "vec_id", "embedding", cand, q_ids, Q, 5,
            driver_cap=cap,
        )
    assert outs["fast"].values.tolist() == outs["slow"].values.tolist()
    assert len(outs["fast"]) == 10  # 2 queries x k=5


def test_duplicated_window_stats_planted(ray_session, tmp_path):
    """Exact-substring duplication: a verbatim 2x repeat inside one doc
    and a cross-doc copy both count; unique docs report dup_frac 0;
    docs shorter than the window are excluded."""
    import pyarrow.parquet as pq_

    from datamart_ray.stages.dedup import duplicated_window_stats

    rep = " ".join(f"s{j}" for j in range(8))
    texts = [
        rep + " " + rep,                       # self-repeat
        "copya " + rep,                        # cross-doc with 0 and 1
        " ".join(f"u{j}" for j in range(20)),  # unique
        "short doc",                           # < window -> excluded
    ]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    d = tmp_path / "docs"
    d.mkdir()
    pq_.write_table(t, str(d / "documents.parquet"))
    out = duplicated_window_stats(str(d), window=8)
    assert out["doc_id"].tolist() == [0, 1, 2]
    got = {r.doc_id: (r.n_windows, r.n_dup_windows) for r in out.itertuples()}
    # doc 0: 9 windows; every window of the repeated 8-gram region that
    # also appears elsewhere counts — the pure 's0..s7' window appears
    # 2x in doc 0 and 1x in doc 1
    assert got[2] == (13, 0)
    assert got[0][1] > 0 and got[1][1] > 0
    assert out.loc[out.doc_id == 2, "dup_frac"].iloc[0] == 0.0


def test_duplicated_window_stats_above_cap_path(ray_session, tmp_path):
    """cap=0 forces the shuffle-join fallback (dup windows never touch
    the driver); output must be bit-identical to the broadcast path."""
    import pyarrow.parquet as pq_

    from datamart_ray.stages.dedup import duplicated_window_stats

    rep = " ".join(f"s{j}" for j in range(8))
    texts = [
        rep + " " + rep,
        "copya " + rep,
        " ".join(f"u{j}" for j in range(20)),
        "short doc",
    ]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    d = tmp_path / "docs"
    d.mkdir()
    pq_.write_table(t, str(d / "documents.parquet"))
    fast = duplicated_window_stats(str(d), window=8)
    slow = duplicated_window_stats(str(d), window=8, cap=0)
    pd.testing.assert_frame_equal(fast, slow)
    assert list(slow.dtypes[:3].astype(str)) == ["int64"] * 3


def test_anti_filter_ids_both_paths(ray_session):
    """anti_filter_ids: broadcast and hash-join paths agree, preserve
    int dtypes, and tolerate duplicate drop ids."""
    from datamart_ray.stages.dedup import anti_filter_ids

    # big: > 2^53 (detects any float64 round-trip); nil: nullable int64
    big0 = (1 << 60) + 1
    t = pa.table(
        {
            "doc_id": pa.array(range(50), type=pa.int64()),
            "n": pa.array([i * 10 for i in range(50)], type=pa.int32()),
            "s": pa.array([f"x{i}" for i in range(50)]),
            "b": pa.array([i % 2 == 0 for i in range(50)]),
            "big": pa.array(
                [big0 + i for i in range(50)], type=pa.int64()
            ),
            "nil": pa.array(
                [None if i % 5 == 0 else i for i in range(50)],
                type=pa.int64(),
            ),
        }
    )
    payload = rd.from_arrow(t)
    drop = rd.from_items(
        [{"doc_id": i} for i in (3, 7, 7, 11, 49, 99)]
    )
    want = sorted(set(range(50)) - {3, 7, 11, 49})
    for cap in (1_000_000, 0):
        out = (
            anti_filter_ids(payload, drop, "doc_id", cap=cap)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["doc_id"].tolist() == want
        # declared schema survives the drop-side typed-null padding,
        # including narrow ints and bools
        assert str(out["n"].dtype) == "int32"
        assert str(out["b"].dtype) == "bool"
        assert out["b"].tolist() == [i % 2 == 0 for i in want]
        assert out["s"].tolist() == [f"x{i}" for i in want]
        # int64 > 2^53 exact (no float64 round trip anywhere)
        assert out["big"].tolist() == [big0 + i for i in want]
        # genuinely-null int64 payload values survive (as NaN/NA in
        # pandas) without crashing the distributed path
        got_nil = [
            None if pd.isna(v) else int(v) for v in out["nil"]
        ]
        assert got_nil == [
            None if i % 5 == 0 else i for i in want
        ]


def test_clean_pack_above_cap_path(ray_session):
    """pl_clean_pack with cap=0 routes the drop set through the anti
    hash join; result pinned identical to the broadcast path."""
    from datamart_ray.pipelines.cleanpack import clean_pack_pipeline

    sf = "/root/testdata/sf0.001"
    fast = clean_pack_pipeline(sf)
    slow = clean_pack_pipeline(sf, cap=0)
    pd.testing.assert_frame_equal(fast, slow)


def test_removal_manifest_ds_matches_driver_core(ray_session, tmp_path):
    """The Dataset-shaped manifest equals the driver convenience output."""
    import pyarrow.parquet as pq_

    from datamart_ray.stages.dedup import (
        minhash_candidate_pairs_ds,
        removal_manifest_ds,
        survivors_from_verified,
        verified_pairs_ds,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    texts = [
        f"doc {i} " + " ".join(f"w{i}{j}" for j in range(30))
        for i in range(20)
    ]
    texts += [base + "x", base + "y", base + "z"]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    d = tmp_path / "docs"
    d.mkdir()
    path = str(d / "documents.parquet")
    pq_.write_table(t, path)

    cand = minhash_candidate_pairs_ds(
        rd.read_parquet(path, columns=["doc_id", "text"])
    )
    verified = verified_pairs_ds(path, cand, 3, 0.5)
    want = survivors_from_verified(verified, cc_driver_cap=0)  # dist path
    got = (
        removal_manifest_ds(verified)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.values.tolist() == want.values.tolist()
    assert len(got) == 2


def test_rescore_fast_path_drops_missing_cand(ray_session):
    """A cand_id with no embedding row must be DROPPED by the fast
    (driver-planned) rescore path, exactly as the slow path's hash join
    drops it — not scored against a neighboring vector."""
    import pyarrow.parquet as pq_

    from datamart_ray.stages.similarity import (
        _distributed_rescore_ds,
        _to_matrix,
    )

    sf = "/root/testdata/sf0.001"
    path = f"{sf}/embeddings.parquet"
    qt = pq_.read_table(path, columns=["vec_id", "embedding"]).slice(0, 1)
    q_ids = qt["vec_id"].to_numpy(zero_copy_only=False)
    Q = _to_matrix(qt["embedding"])
    n = pq_.read_metadata(path).num_rows
    # real candidates + one id past the end (searchsorted insertion ==
    # len) + one id inside the range but absent only if ids are sparse
    items = [
        {"query_id": int(q_ids[0]), "cand_id": c}
        for c in list(range(5, 15)) + [n + 999, 10**12]
    ]
    outs = {}
    for cap, label in ((500_000, "fast"), (0, "slow")):
        cand = rd.from_items(items)
        outs[label] = _distributed_rescore_ds(
            path, "vec_id", "embedding", cand, q_ids, Q, 5,
            driver_cap=cap,
        )
    assert outs["fast"].values.tolist() == outs["slow"].values.tolist()
    assert (outs["fast"]["neighbor_id"] < n).all()
    assert len(outs["fast"]) == 5


def test_knn_filtered_empty_fragment(ray_session, tmp_path):
    """A row group whose label stats straddle the predicate but contains
    no matching row yields a 0-row batch after the pushed-down filter —
    the score kernel must tolerate it (reshape(0,-1) used to raise)."""
    import pyarrow.parquet as pq_

    from datamart_ray.stages.similarity import knn_label_filtered

    rng = np.random.default_rng(7)
    d = 8
    emb = [list(map(float, rng.standard_normal(d))) for _ in range(40)]
    # row group 1: labels 1/5 only (stats straddle 3, no match);
    # row group 2: labels 3 (matches)
    labels = [1, 5] * 10 + [3] * 20
    t = pa.table(
        {
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array(emb, pa.list_(pa.float64())),
            "label": pa.array(labels, pa.int64()),
        }
    )
    path = str(tmp_path / "embeddings.parquet")
    pq_.write_table(t, path, row_group_size=20)
    out = knn_label_filtered(
        str(tmp_path), query_ids=(0, 1), k=3, label=3
    )
    assert len(out) == 6
    assert set(out["neighbor_id"]) <= set(range(20, 40))


def test_xlsx_duplicate_headers_and_rels_sheet_order(tmp_path):
    """Duplicate header names must be uniquified (not silently dropped),
    and the first sheet resolves through workbook.xml rels even when its
    part is numbered sheet2.xml."""
    import zipfile

    import pyarrow.parquet as pq_

    from datamart_ray.sources.xlsx import convert_xlsx_to_parquet

    wb = """<?xml version="1.0"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
 <sheets><sheet name="Main" sheetId="4" r:id="rId7"/></sheets></workbook>"""
    rels = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId7" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
</Relationships>"""
    # decoy sheet1.xml (a deleted tab's leftover numbering) and the real
    # first-tab data in sheet2.xml, with two columns both named "value"
    decoy = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData><row r="1"><c r="A1" t="inlineStr"><is><t>WRONG</t></is></c></row></sheetData></worksheet>"""
    real = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1"><c r="A1" t="inlineStr"><is><t>value</t></is></c><c r="B1" t="inlineStr"><is><t>value</t></is></c></row>
  <row r="2"><c r="A2"><v>1</v></c><c r="B2"><v>2</v></c></row>
 </sheetData></worksheet>"""
    x = tmp_path / "book.xlsx"
    with zipfile.ZipFile(str(x), "w") as z:
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        z.writestr("xl/worksheets/sheet1.xml", decoy)
        z.writestr("xl/worksheets/sheet2.xml", real)
    out = convert_xlsx_to_parquet(str(x), str(tmp_path / "pq"))
    t = pq_.read_table(f"{out}/data.parquet")
    assert t.column_names == ["value", "value_2"]
    assert t["value"].to_pylist() == [1.0]
    assert t["value_2"].to_pylist() == [2.0]


def test_stata_converter_and_magic_sniff(tmp_path):
    """S10: chunked .dta → parquet round-trip; the extensionless path
    detects Stata by magic bytes (reference materialize.py:195-205);
    SPSS raises the honest pyreadstat gate."""
    import pyarrow.parquet as pq_
    import pytest as _pytest

    from datamart_ray.sources import detect_and_convert
    from datamart_ray.sources.stata import (
        convert_spss_to_parquet,
        convert_stata_to_parquet,
        sniff_magic,
    )

    df = pd.DataFrame(
        {
            "city": [f"c{i}" for i in range(250)],
            "pop": np.arange(250, dtype=np.float64) * 1.5,
            "flag": ([1, 0] * 125),
        }
    )
    src = tmp_path / "table.dta"
    df.to_stata(str(src), write_index=False)
    out = convert_stata_to_parquet(str(src), str(tmp_path / "pq"),
                                   chunksize=100)
    t = pq_.read_table(out).to_pandas().sort_values("pop")
    assert len(t) == 250
    assert t["city"].tolist() == df["city"].tolist()
    assert np.allclose(t["pop"].to_numpy(), df["pop"].to_numpy())

    # extensionless: magic sniff routes to the stata converter
    anon = tmp_path / "blob"
    anon.write_bytes(src.read_bytes())
    assert sniff_magic(str(anon)) == "stata"
    out2 = detect_and_convert(str(anon), str(tmp_path / "pq2"))
    assert pq_.read_table(out2).num_rows == 250

    sav = tmp_path / "x.sav"
    sav.write_bytes(b"$FL2" + b"\x00" * 32)
    assert sniff_magic(str(sav)) == "spss"
    # with pyreadstat absent, the NATIVE parser's diagnosis surfaces
    # (not a masking ImportError) — here: truncated header
    with _pytest.raises(ValueError, match="truncated"):
        convert_spss_to_parquet(str(sav), str(tmp_path / "pq3"))


def _sav_header(endian, compression, nominal, ncases, magic=b"$FL2",
                bias=100.0):
    import struct as st

    return (
        magic
        + b"@(#) test product".ljust(60)
        + st.pack(endian + "i", 2)
        + st.pack(endian + "4i", nominal, compression, 0, ncases)
        + st.pack(endian + "d", bias)
        + b"01 Jan 26" + b"00:00:00" + b" " * 64 + b"\x00" * 3
    )


def _sav_var(endian, vtype, name):
    import struct as st

    return (
        st.pack(endian + "i", 2)
        + st.pack(endian + "3i", vtype, 0, 0)
        + st.pack(endian + "2i", 0, 0)
        + name.ljust(8).encode()
    )


def _sav_dict_tail(endian, longnames=None):
    import struct as st

    out = b""
    if longnames:
        data = longnames.encode()
        out += st.pack(endian + "i", 7) + st.pack(
            endian + "3i", 13, 1, len(data)
        ) + data
    out += st.pack(endian + "i", 999) + st.pack(endian + "i", 0)
    return out


def test_spss_native_reader_uncompressed(tmp_path):
    """S11: hand-crafted uncompressed .sav (numeric + 8B string + 12B
    string w/ continuation record + sysmis + long names) round-trips
    through the native parser."""
    import struct as st

    from datamart_ray.sources.spss import SYSMIS, read_sav

    e = "<"
    # vars: X (numeric), S8 (string 8), S12 (string 12 → 2 elements)
    dic = (
        _sav_var(e, 0, "X")
        + _sav_var(e, 8, "S8")
        + _sav_var(e, 12, "S12")
        + _sav_var(e, -1, "S12_1")  # continuation
        + _sav_dict_tail(e, "X=score\tS12=comment")
    )
    rows = [
        (1.5, b"alpha   ", b"hello world " + b" " * 4),
        (SYSMIS, b"beta    ", b"bye         " + b" " * 4),
    ]
    data = b"".join(
        st.pack(e + "d", x) + s8 + s12 for x, s8, s12 in rows
    )
    p = tmp_path / "t.sav"
    p.write_bytes(_sav_header(e, 0, 4, 2) + dic + data)
    t = read_sav(str(p))
    assert t.column_names == ["score", "S8", "comment"]
    assert t["score"].to_pylist() == [1.5, None]
    assert t["S8"].to_pylist() == ["alpha", "beta"]
    assert t["comment"].to_pylist() == ["hello world", "bye"]


def test_spss_native_reader_bytecode_and_zsav(tmp_path):
    """Bytecode RLE (bias-centered smalls, literal, spaces, sysmis, EOF)
    and the zlib-blocked $FL3 container decode identically."""
    import struct as st
    import zlib

    from datamart_ray.sources.spss import read_sav

    e = "<"
    dic = (
        _sav_var(e, 0, "N")
        + _sav_var(e, 8, "S")
        + _sav_dict_tail(e)
    )
    # case 1: N=5 (cmd 105), S=literal "abc     "; case 2: N=sysmis,
    # S=8 spaces; then EOF. 6 commands + 2 pads in one group.
    cmds = bytes([105, 253, 255, 254, 252, 0, 0, 0])
    payload = cmds + b"abc     "
    p1 = tmp_path / "bc.sav"
    p1.write_bytes(_sav_header(e, 1, 2, 2) + dic + payload)
    t = read_sav(str(p1))
    assert t["N"].to_pylist() == [5.0, None]
    assert t["S"].to_pylist() == ["abc", ""]

    # same payload through the $FL3 zlib block container
    comp = zlib.compress(payload)
    header = _sav_header(e, 2, 2, 2, magic=b"$FL3")
    pre = header + dic
    zheader_ofs = len(pre)
    blocks_start = zheader_ofs + 24
    ztrailer_ofs = blocks_start + len(comp)
    trailer = st.pack(e + "qqii", 100, 0, 0x3FF000, 1) + st.pack(
        e + "qqii", 0, blocks_start, len(payload), len(comp)
    )
    p2 = tmp_path / "bc.zsav"
    p2.write_bytes(
        pre
        + st.pack(e + "3q", zheader_ofs, ztrailer_ofs, len(trailer))
        + comp
        + trailer
    )
    t2 = read_sav(str(p2))
    assert t2.to_pydict() == t.to_pydict()


def test_spss_big_endian_and_detect_route(tmp_path):
    """Byte-order is detected from layout_code; detect_and_convert
    routes an extensionless $FL2 file to the SPSS converter."""
    import struct as st

    import pyarrow.parquet as pq

    from datamart_ray.sources.convert import detect_and_convert
    from datamart_ray.sources.spss import read_sav
    from datamart_ray.sources.stata import sniff_magic

    e = ">"
    dic = _sav_var(e, 0, "V") + _sav_dict_tail(e)
    data = st.pack(e + "d", 7.25) + st.pack(e + "d", -2.0)
    p = tmp_path / "be.sav"
    raw = _sav_header(e, 0, 1, 2) + dic + data
    p.write_bytes(raw)
    assert read_sav(str(p))["V"].to_pylist() == [7.25, -2.0]

    anon = tmp_path / "mystery"
    anon.write_bytes(raw)
    assert sniff_magic(str(anon)) == "spss"
    out = detect_and_convert(str(anon), str(tmp_path / "pq"))
    got = pq.read_table(out)
    assert got["V"].to_pylist() == [7.25, -2.0]


def test_hll_error_bound_and_merge_invariance():
    """HLL: estimate within 5% of truth at several cardinalities, and
    register merge is associative/layout-independent (bit-identical
    registers for any block split of the same values)."""
    from datamart_ray.stages.sketches import (
        hll_estimate,
        hll_fold,
    )

    rng = np.random.RandomState(11)
    for n in (100, 5_000, 200_000):
        vals = rng.randint(0, 2**62, size=n).astype(np.uint64)
        exact = len(np.unique(vals))
        est = hll_estimate(hll_fold(vals))
        assert abs(est - exact) / exact < 0.05, (n, est, exact)
        whole = hll_fold(vals)
        for cuts in (3, 7):
            parts = np.array_split(vals, cuts)
            merged = np.zeros_like(whole)
            for part in parts:
                merged = np.maximum(merged, hll_fold(part))
            assert np.array_equal(merged, whole), cuts


def test_hll_distinct_users_entry(ray_session):
    """The distributed fold equals the scalar fold on the same values,
    and the entry's estimate lands within 5% of the exact distinct."""
    import duckdb

    from datamart_ray.stages.sketches import (
        hll_distinct_users,
        hll_estimate,
        hll_fold,
    )

    sf = "/root/testdata/sf0.001"
    out = hll_distinct_users(sf)
    assert list(out.columns) == ["column", "hll_p", "estimate", "regs_sum"]
    exact = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM "
        f"read_parquet('{sf}/events.parquet')"
    ).fetchone()[0]
    est = int(out["estimate"].iloc[0])
    assert abs(est - exact) / exact < 0.05, (est, exact)
    # scalar reference on the full column
    import pyarrow.parquet as pq

    vals = (
        pq.read_table(f"{sf}/events.parquet", columns=["user_id"])
        ["user_id"].to_numpy().astype(np.int64).view(np.uint64)
    )
    scalar_est = int(round(hll_estimate(hll_fold(vals))))
    assert est == scalar_est  # distributed == scalar, bit-deterministic


def test_knn_sq8_matches_exact(ray_session):
    """SQ8 codes + oversampled rescore return the exact top-k frame;
    the uint8 grid loses at most scale/2 per dimension, far below the
    fixture's neighbor gaps."""
    from datamart_ray.stages.similarity import knn_cosine, knn_sq8

    sf = "/root/testdata/sf0.001"
    exact = knn_cosine(sf, query_ids=(0, 1), k=5).reset_index(drop=True)
    sq8 = knn_sq8(sf, query_ids=(0, 1), k=5).reset_index(drop=True)
    assert sq8.equals(exact)


def test_knn_pq_matches_exact(ray_session):
    """PQ/ADC candidates + oversampled exact rescore return the exact
    top-k frame on the fixture; the codebook artifact makes a second
    call train-free."""
    from datamart_ray.stages.similarity import knn_cosine, knn_pq

    sf = "/root/testdata/sf0.001"
    exact = knn_cosine(sf, query_ids=(0, 1), k=5).reset_index(drop=True)
    got = knn_pq(sf, query_ids=(0, 1), k=5).reset_index(drop=True)
    assert got.equals(exact)


def test_pq_codebook_deterministic_and_persisted(ray_session):
    from datamart_ray.stages.similarity import pq_codebooks

    a = pq_codebooks("/root/testdata/sf0.001")
    b = pq_codebooks("/root/testdata/sf0.001")  # artifact reload path
    assert a.shape == (8, 32, 8)
    assert np.array_equal(a, b)


def test_knn_ivfpq_matches_exact(ray_session):
    """Coarse-probe candidate routing + PQ/ADC in-cluster ranking +
    exact rescore return the exact top-k frame on the fixture."""
    from datamart_ray.stages.similarity import knn_cosine, knn_ivfpq

    sf = "/root/testdata/sf0.001"
    exact = knn_cosine(sf, query_ids=(0, 1), k=5).reset_index(drop=True)
    got = knn_ivfpq(sf, query_ids=(0, 1), k=5).reset_index(drop=True)
    assert got.equals(exact)


def test_temperature_mix_upweights_low_resource(ray_session):
    """alpha<1 keeps a HIGHER fraction of low-resource languages than
    of high-resource ones, and the sample is non-vacuous."""
    import duckdb

    from datamart_ray.stages.sampling import temperature_mix_sample

    sf = "/root/testdata/sf0.01"
    out = temperature_mix_sample(sf)
    assert len(out) > 0
    con = duckdb.connect()
    tot = dict(
        con.execute(
            f"SELECT lang, count(*) FROM read_parquet('{sf}/documents.parquet') GROUP BY lang"
        ).fetchall()
    )
    kept = out.groupby("lang").size().to_dict()
    fracs = {k: kept.get(k, 0) / tot[k] for k in tot}
    hi = max(tot, key=lambda k: tot[k])
    lo = min(tot, key=lambda k: tot[k])
    if tot[hi] > 2 * tot[lo]:  # only meaningful with real skew
        assert fracs[lo] > fracs[hi]
