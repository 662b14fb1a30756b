"""Cross-parallelism determinism: representative entries must produce
IDENTICAL results under different cluster sizes (fresh Ray session per
level, subprocess isolation) — the single-node evidence for the
north-rule requirement that results never depend on worker count."""

import json
import os
import subprocess
import sys

import pytest

SCRIPT = r"""
import json, sys
import ray
ray.init(address="local", num_cpus=int(sys.argv[1]),
         include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, {repo!r})
import __ray_entry__ as e
out = {{}}
qs = e.queries()
for name in {names!r}:
    df = qs[name]({sf!r})
    try:
        df = df.to_pandas()
    except AttributeError:
        pass
    out[name] = df.to_json(orient="records")
print("RESULT:" + json.dumps(out))
ray.shutdown()
"""


@pytest.mark.slow
def test_entries_identical_across_cpu_counts(tmp_path):
    names = [
        "q02_revenue_by_nation",
        "dd_minhash_near_dups",
        "rg_coverage_ranges",
        "tw_sliding_window",
        "sim_knn_cosine",
        # r3 additions whose semantics depend on GLOBAL order/state:
        # the prefix-scan packing (block-offset scan), the arithmetic
        # sample (must be layout-stable by construction), sessionization
        # (per-user shard grouping), and the composite pipeline
        "pk_packed_windows",
        "sa_stratified_sample",
        "tw_sessionize",
        "pl_clean_pack",
    ]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = SCRIPT.format(
        repo=repo, names=names, sf="/root/testdata/sf0.001"
    )
    results = {}
    for ncpu in (3, 8):
        p = subprocess.run(
            [sys.executable, "-c", script, str(ncpu)],
            capture_output=True,
            text=True,
            timeout=600,
            cwd=repo,
        )
        assert p.returncode == 0, p.stderr[-2000:]
        line = [
            ln for ln in p.stdout.splitlines() if ln.startswith("RESULT:")
        ][-1]
        results[ncpu] = json.loads(line[len("RESULT:"):])
    for name in names:
        assert results[3][name] == results[8][name], name
