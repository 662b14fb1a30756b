"""Deterministic synthetic source-code corpus (FIXTURES.md §A).

Generates the authoritative input table from BASELINE.json ``input_hint``:
Parquet with columns ``(repo:string, path:string, commit:string,
lang:string, content:string)``. Fully seeded (default 42) and independent of
parallelism: generation is a single pass on the driver, rows sorted by
``(repo, path, commit)`` before writing so the engine's file-offset docIDs
equal the canonical sort rank.

Content is a Zipf-distributed mix of code-like identifiers with planted
**marker terms** at known document frequencies, driving the reference query
set (unique df=1, common ~33%, conjunctions, lang-filtered, head-term
stress, zero-hit, and exact score ties for tie-break pinning).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["python", "java", "go", "rust", "javascript", "c"]
_EXT = {
    "python": "py",
    "java": "java",
    "go": "go",
    "rust": "rs",
    "javascript": "js",
    "c": "c",
}

# Markers planted by pre-sort file index i (df facts hold after sorting).
MARKER_UNIQUE = "qzuniqueneedle"  # i == 7            → df = 1
MARKER_COMMON = "qzcommonneedle"  # i % 3 == 0        → df ≈ N/3
MARKER_PAIR_A = "qzpairneedlea"  # i % 7 == 0
MARKER_PAIR_B = "qzpairneedleb"  # i % 11 == 0        → conjunction df ≈ N/77
MARKER_FILTER = "qzfilterneedle"  # i % 13 == 0       → + lang filter
MARKER_HEAD = "qzstopneedle"  # every doc            → head-term stress
MARKER_ZERO = "qzneverexists"  # never planted        → zero hits
TIE_CONTENT = "qztieneedle qztieneedle alpha beta"  # docs 20 & 21 verbatim

_SYLLABLES = [
    "al", "ba", "cor", "dex", "el", "fen", "gro", "hul", "in", "jor",
    "ka", "lum", "mor", "nex", "ost", "pra", "qu", "ril", "sto", "tur",
    "um", "vex", "wol", "xan", "yor", "zem", "ach", "bri", "cla", "dro",
]


def _make_vocab(vocab_size: int, rng: np.random.Generator) -> np.ndarray:
    syl = np.array(_SYLLABLES)
    n_syl = len(syl)
    parts = rng.integers(0, n_syl, size=(vocab_size, 3))
    suffix = rng.integers(0, 100, size=vocab_size)
    vocab = np.array(
        [
            f"{syl[a]}{syl[b]}{syl[c]}{s if s % 4 == 0 else ''}"
            for (a, b, c), s in zip(parts, suffix)
        ]
    )
    return vocab


_SEPARATORS = np.array(
    [" ", " ", " ", "(", ") ", " = ", ";\n", ".", ", ", " + ", "[", "] "]
)

_HTML_SNIPPET = ' html = "<div class=\\"hdr\\"><b>title</b></div>"\n'


def generate_corpus(
    out_dir: str,
    n_files: int = 500,
    vocab_size: int = 5000,
    n_repos: int = 20,
    avg_tokens: int = 120,
    n_output_files: int = 4,
    seed: int = 42,
    big_outliers: int = 0,
) -> list[str]:
    """Write the corpus to ``out_dir``; returns the parquet paths written."""
    rng = np.random.default_rng(seed)
    vocab = _make_vocab(vocab_size, rng)

    # Zipf-ish term distribution over the vocabulary.
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = 1.0 / (ranks + 2.7) ** 1.07
    probs /= probs.sum()

    # Zipf-ish file counts per repo (skew driver for shuffles).
    repo_ranks = np.arange(1, n_repos + 1, dtype=np.float64)
    repo_probs = (1.0 / repo_ranks) / (1.0 / repo_ranks).sum()
    repo_idx = rng.choice(n_repos, size=n_files, p=repo_probs)
    lang_idx = rng.integers(0, len(LANGS), size=n_files)

    tokens_per_file = rng.poisson(avg_tokens, size=n_files).clip(min=8)
    if big_outliers > 0:
        big = rng.choice(n_files, size=min(big_outliers, n_files), replace=False)
        tokens_per_file[big] = avg_tokens * 80
    total = int(tokens_per_file.sum())
    all_tokens = vocab[rng.choice(vocab_size, size=total, p=probs)]
    all_seps = _SEPARATORS[rng.integers(0, len(_SEPARATORS), size=total)]
    offsets = np.zeros(n_files + 1, dtype=np.int64)
    np.cumsum(tokens_per_file, out=offsets[1:])

    repos, paths, commits, langs, contents = [], [], [], [], []
    for i in range(n_files):
        lang = LANGS[int(lang_idx[i])]
        repo = f"org{int(repo_idx[i]) % 4}/repo{int(repo_idx[i])}"
        path = f"src/module_{i % 17}/file_{i}.{_EXT[lang]}"
        commit = hashlib.sha1(f"{repo}:{path}:0".encode()).hexdigest()
        if i in (20, 21):
            content = TIE_CONTENT
        else:
            toks = all_tokens[offsets[i] : offsets[i + 1]]
            seps = all_seps[offsets[i] : offsets[i + 1]]
            pieces = np.empty(toks.size * 2, dtype=object)
            pieces[0::2] = toks
            pieces[1::2] = seps
            content = "".join(pieces)
            extra = [MARKER_HEAD]
            if i == 7:
                extra.append(MARKER_UNIQUE)
            if i % 3 == 0:
                extra.append(MARKER_COMMON)
            if i % 7 == 0:
                extra.append(MARKER_PAIR_A)
            if i % 11 == 0:
                extra.append(MARKER_PAIR_B)
            if i % 13 == 0:
                extra.append(MARKER_FILTER)
            if i % 23 == 0:
                content += _HTML_SNIPPET
            content += "\n# " + " ".join(extra) + "\n"
        repos.append(repo)
        paths.append(path)
        commits.append(commit)
        langs.append(lang)
        contents.append(content)

    table = pa.table(
        {
            "repo": pa.array(repos, type=pa.string()),
            "path": pa.array(paths, type=pa.string()),
            "commit": pa.array(commits, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
            "content": pa.array(contents, type=pa.string()),
        }
    )
    table = table.sort_by(
        [("repo", "ascending"), ("path", "ascending"), ("commit", "ascending")]
    )

    os.makedirs(out_dir, exist_ok=True)
    written = []
    splits = np.array_split(np.arange(n_files), n_output_files)
    row = 0
    for j, idx in enumerate(splits):
        if idx.size == 0:
            continue
        part = table.slice(row, idx.size)
        row += idx.size
        dest = os.path.join(out_dir, f"corpus-{j:05d}.parquet")
        pq.write_table(part, dest, row_group_size=max(64, idx.size // 4))
        written.append(dest)
    return written


def reference_queries() -> list[dict]:
    """The deterministic reference query set (FIXTURES.md §A)."""
    return [
        {"name": "unique_marker", "query": MARKER_UNIQUE, "mode": "and"},
        {"name": "common_term", "query": MARKER_COMMON, "mode": "and"},
        {
            "name": "conjunction_pair",
            "query": f"{MARKER_PAIR_A} {MARKER_PAIR_B}",
            "mode": "and",
        },
        {
            "name": "lang_filtered",
            "query": MARKER_FILTER,
            "mode": "and",
            "lang": "python",
        },
        {
            "name": "head_term_stress",
            "query": f"{MARKER_HEAD} {MARKER_COMMON}",
            "mode": "or",
        },
        {"name": "zero_hits", "query": MARKER_ZERO, "mode": "and"},
        {"name": "tie_break", "query": "qztieneedle", "mode": "and"},
        {
            "name": "or_mix",
            "query": f"{MARKER_UNIQUE} {MARKER_COMMON} {MARKER_PAIR_B}",
            "mode": "or",
        },
    ]
