import numpy as np
import pyarrow as pa

from datamart_ray.analyzer import Analyzer


def test_tokenize_basic():
    a = Analyzer()
    assert a.tokenize("Hello, World! x2") == ["hello", "world", "x2"]


def test_tokenize_code():
    a = Analyzer()
    assert a.tokenize("def get_foo(bar):\n  return bar+1") == [
        "def", "get", "foo", "bar", "return", "bar", "1",
    ]


def test_html_strip():
    a = Analyzer(html_strip=True)
    assert a.tokenize('x = "<div class="h">Tit</div>" y') == ["x", "tit", "y"]
    plain = Analyzer()
    assert "div" in plain.tokenize("<div>x</div>")


def test_token_lists_nulls_and_empties():
    a = Analyzer()
    col = pa.array(["one two", None, "", "  ", "three"], type=pa.string())
    lists = a.token_lists(col)
    assert lists.to_pylist() == [["one", "two"], [], [], [], ["three"]]


def test_term_frequencies():
    a = Analyzer()
    col = pa.array(["b a b a b", "a c"], type=pa.string())
    tf, doclens = a.term_frequencies(col)
    assert np.array_equal(doclens, [5, 2])
    got = {
        (r["row_idx"], r["term"]): r["tf"] for r in tf.to_pylist()
    }
    assert got == {(0, "a"): 2, (0, "b"): 3, (1, "a"): 1, (1, "c"): 1}


def test_min_max_token_len():
    a = Analyzer(min_token_len=2, max_token_len=4)
    assert a.tokenize("a bb ccc dddd eeeee") == ["bb", "ccc", "dddd"]


def test_sql_expr_matches_python(tmp_path):
    import duckdb

    a = Analyzer()
    texts = [
        "Hello, World! x2",
        "def get_foo(bar):\n  return bar+1",
        "",
        "CamelCase and_snake 42x",
    ]
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {a.sql_tokens_expr('t')} FROM (SELECT unnest(?) AS t)",
        [texts],
    ).fetchall()
    for (sql_tokens,), text in zip(got, texts):
        assert sql_tokens == a.tokenize(text)


def test_stopwords_filter_and_sql_parity():
    import duckdb

    a = Analyzer(stopwords=("the", "a", "of"))
    assert a.tokenize("The hash of a window") == ["hash", "window"]
    texts = ["The hash of a window", "a the of", "no stops here"]
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {a.sql_tokens_expr('t')} FROM (SELECT unnest(?) AS t)",
        [texts],
    ).fetchall()
    for (sql_tokens,), text in zip(got, texts):
        assert sql_tokens == a.tokenize(text)


def test_stopwords_roundtrip_kwargs():
    a = Analyzer(stopwords=["the", "a"])  # list in → tuple pinned
    assert a.stopwords == ("the", "a")
    b = Analyzer(**a.to_kwargs())
    assert b == a


def test_stopwords_survive_index_config_roundtrip():
    """Regression: IndexConfig.to_json() must carry analyzer stopwords —
    dropping them makes the ES 'stop'-filter feature a silent no-op on
    every indexed path (build workers, engines, CLI analyze)."""
    from datamart_ray.index.build import IndexConfig

    cfg = IndexConfig(analyzer=Analyzer(stopwords=("the", "a")))
    back = IndexConfig.analyzer_from_json(cfg.to_json())
    assert back.stopwords == ("a", "the") or set(back.stopwords) == {"the", "a"}
    assert back.tokenize("the hash a join") == ["hash", "join"]
    # old manifests without the key keep the default empty tuple
    obj = cfg.to_json()
    del obj["analyzer"]["stopwords"]
    assert IndexConfig.analyzer_from_json(obj).stopwords == ()


def test_split_camel_tokenize():
    a = Analyzer(split_camel=True)
    assert a.tokenize("getUserName") == ["get", "user", "name"]
    assert a.tokenize("HTTPServer") == ["http", "server"]
    assert a.tokenize("XMLHttpRequest") == ["xml", "http", "request"]
    assert a.tokenize("foo_bar x9Pro") == ["foo", "bar", "x9", "pro"]
    # default analyzer keeps the mashed lowercase term
    assert Analyzer().tokenize("getUserName") == ["getusername"]


def test_split_camel_sql_parity():
    import duckdb

    a = Analyzer(split_camel=True)
    texts = [
        "getUserName HTTPServer",
        "XMLHttpRequest foo_bar",
        "x9Pro ABCDef plain lower",
        "",
    ]
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {a.sql_tokens_expr('t')} FROM (SELECT unnest(?) AS t)",
        [texts],
    ).fetchall()
    for (sql_tokens,), text in zip(got, texts):
        assert sql_tokens == a.tokenize(text)


def test_split_camel_roundtrip_kwargs():
    a = Analyzer(split_camel=True)
    b = Analyzer(**a.to_kwargs())
    assert b.split_camel is True
    assert b.tokenize("getUserName") == ["get", "user", "name"]
