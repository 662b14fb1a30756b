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
