import numpy as np
import pyarrow as pa
import pytest

from datamart_ray.analyzer import Analyzer
from datamart_ray.stemmer import porter_stem

# canonical examples from Porter's paper
PORTER_CASES = [
    ("caresses", "caress"),
    ("ponies", "poni"),
    ("ties", "ti"),
    ("caress", "caress"),
    ("cats", "cat"),
    ("feed", "feed"),
    ("agreed", "agre"),
    ("plastered", "plaster"),
    ("bled", "bled"),
    ("motoring", "motor"),
    ("sing", "sing"),
    ("conflated", "conflat"),
    ("troubled", "troubl"),
    ("sized", "size"),
    ("hopping", "hop"),
    ("tanned", "tan"),
    ("falling", "fall"),
    ("hissing", "hiss"),
    ("fizzed", "fizz"),
    ("failing", "fail"),
    ("filing", "file"),
    ("happy", "happi"),
    ("sky", "sky"),
    ("relational", "relat"),
    ("conditional", "condit"),
    ("rational", "ration"),
    ("valenci", "valenc"),
    ("digitizer", "digit"),
    ("operator", "oper"),
    ("feudalism", "feudal"),
    ("decisiveness", "decis"),
    ("hopefulness", "hope"),
    ("formaliti", "formal"),
    ("triplicate", "triplic"),
    ("formative", "form"),
    ("formalize", "formal"),
    ("electriciti", "electr"),
    ("electrical", "electr"),
    ("hopeful", "hope"),
    ("goodness", "good"),
    ("revival", "reviv"),
    ("allowance", "allow"),
    ("inference", "infer"),
    ("airliner", "airlin"),
    ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"),
    ("defensible", "defens"),
    ("irritant", "irrit"),
    ("replacement", "replac"),
    ("adjustment", "adjust"),
    ("dependent", "depend"),
    ("adoption", "adopt"),
    ("homologou", "homolog"),
    ("communism", "commun"),
    ("activate", "activ"),
    ("angulariti", "angular"),
    ("homologous", "homolog"),
    ("effective", "effect"),
    ("bowdlerize", "bowdler"),
    ("probate", "probat"),
    ("rate", "rate"),
    ("cease", "ceas"),
    ("controll", "control"),
    ("roll", "roll"),
]


@pytest.mark.parametrize("word,expected", PORTER_CASES)
def test_porter_paper_examples(word, expected):
    assert porter_stem(word) == expected


def test_analyzer_with_stemming():
    a = Analyzer(stem="porter")
    assert a.tokenize("Running quickly, the operators agreed!") == [
        "run", "quickli", "the", "oper", "agre",
    ]


def test_stemmed_term_frequencies_merge():
    a = Analyzer(stem="porter")
    tf, doclens = a.term_frequencies(
        pa.array(["running runs run", "jump jumped"], type=pa.string())
    )
    got = {(r["row_idx"], r["term"]): r["tf"] for r in tf.to_pylist()}
    assert got == {(0, "run"): 3, (1, "jump"): 2}
    assert np.array_equal(doclens, [3, 2])


def test_stem_sql_twin_refused():
    with pytest.raises(ValueError):
        Analyzer(stem="porter").sql_tokens_expr("text")


def test_stemmed_index_roundtrip(ray_session, tmp_path):
    """Index built with stemming finds morphological variants."""
    import pyarrow.parquet as pq

    from datamart_ray.index.build import IndexConfig, build_index
    from datamart_ray.search.engine import SearchEngine

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(
                [
                    "the runner was running fast",
                    "he runs daily",
                    "unrelated words entirely",
                ]
            ),
        }
    )
    src = str(tmp_path / "docs.parquet")
    pq.write_table(docs, src)
    idx = str(tmp_path / "idx")
    build_index(
        src,
        idx,
        IndexConfig(
            analyzer=Analyzer(stem="porter"), content_col="text",
            id_col="doc_id", meta_cols=(),
        ),
    )
    eng = SearchEngine(idx)
    assert eng.analyzer.stem == "porter"  # parity restored from manifest
    hits = eng.search("running", k=10)["doc_id"].to_pylist()
    assert hits == [1, 0] or set(hits) == {0, 1}
