"""Scaling-efficiency evidence (BASELINE.md: eff = (thr_32/thr_8)/4 ≥ 0.8).

No real cluster exists in this sandbox (driver instruction), so the same
job runs at two parallelism levels — local[8] vs local[32] — on the SAME
pre-written input, in separate JVMs (a fresh SparkSession per level, so
no warm-cache bleed). Also asserts the output fingerprint is identical at
both levels (determinism row of BASELINE.md).

Writes BENCH/BASELINE.md. Usage: python tools/scaling_bench.py [n_turns]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from biosd_feature_annotator_spark.session import get_spark
from biosd_feature_annotator_spark.sources.lexicon import load_lexicon
from biosd_feature_annotator_spark.sources.transcripts import read_transcripts
from biosd_feature_annotator_spark.plans.pipeline import annotate
from pyspark.sql import functions as F

cores = int(sys.argv[1]); in_path = sys.argv[2]
spark = get_spark(master=f"local[{{cores}}]", app_name=f"scale-{{cores}}")
lex = load_lexicon(os.path.join({repo!r}, "tests", "golden", "lexicon.json"))
transcripts = read_transcripts(spark, in_path).persist()
n_turns = transcripts.count()
t0 = time.time()
triples = annotate(spark, transcripts, lex, build_graph=False)["triples"]
fp_row = triples.select(F.xxhash64(
    *[F.coalesce(F.col(c).cast("string"), F.lit("\0"))
      for c in ("subj", "pred", "obj", "confidence")]).alias("h")
).agg(F.expr("bit_xor(h)").alias("fp"), F.count("*").alias("n")).collect()[0]
dt = time.time() - t0
print(json.dumps({"cores": cores, "n_turns": n_turns, "n_triples": fp_row.n,
                  "fp": fp_row.fp, "wall_sec": round(dt, 3),
                  "turns_per_sec": round(n_turns / dt, 1),
                  "triples_per_sec": round(fp_row.n / dt, 1)}))
spark.stop()
"""


def run_level(cores: int, in_path: str, script: str) -> dict:
    out = subprocess.run(
        [sys.executable, script, str(cores), in_path],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000

    # pre-write the shared input once (not part of either timed run)
    in_path = os.path.join(tempfile.gettempdir(), f"scale_input_{n_turns}")
    gen = (
        "import sys; sys.path.insert(0, %r); "
        "from biosd_feature_annotator_spark.session import get_spark; "
        "from biosd_feature_annotator_spark.synth import synth_transcripts; "
        "from biosd_feature_annotator_spark.sources.transcripts import write_transcripts; "
        "s = get_spark(master='local[32]'); "
        "write_transcripts(synth_transcripts(s, %d), %r, n_buckets=64); s.stop()"
        % (REPO, n_turns, in_path)
    )
    if not os.path.exists(in_path):
        subprocess.run([sys.executable, "-c", gen], check=True, cwd=REPO)

    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(WORKER.format(repo=REPO))
        script = f.name

    r8 = run_level(8, in_path, script)
    r32 = run_level(32, in_path, script)
    eff = (r32["turns_per_sec"] / r8["turns_per_sec"]) / 4.0
    same_fp = r8["fp"] == r32["fp"] and r8["n_triples"] == r32["n_triples"]

    md = f"""# BENCH/BASELINE.md — measured scaling evidence

Generated {datetime.now(timezone.utc).isoformat()} by tools/scaling_bench.py.

Per driver instruction (no real cluster in sandbox), the N→4N-executor
scaling criterion is evidenced by the same end-to-end annotation job
(scan → mapInPandas extraction → broadcast link join → triple union →
fingerprint agg) at two parallelism levels on the SAME pre-written
{r8['n_turns']:,}-turn input, each in a fresh JVM.

| level | turns | triples | wall (s) | turns/s | triples/s |
|---|---|---|---|---|---|
| local[8]  | {r8['n_turns']:,} | {r8['n_triples']:,} | {r8['wall_sec']} | {r8['turns_per_sec']:,} | {r8['triples_per_sec']:,} |
| local[32] | {r32['n_turns']:,} | {r32['n_triples']:,} | {r32['wall_sec']} | {r32['turns_per_sec']:,} | {r32['triples_per_sec']:,} |

**Scaling efficiency (thr_32 / thr_8) / 4 = {eff:.3f}** (target ≥ 0.8,
BASELINE.json). Note 8→32 cores on one box shares memory bandwidth and a
single shuffle disk — a lower bound on true multi-executor scaling.

**Determinism across parallelism**: output bit_xor fingerprint identical
at both levels: {same_fp} (fp={r8['fp']}).
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"eff": round(eff, 3), "same_fp": same_fp, "r8": r8, "r32": r32}))


if __name__ == "__main__":
    main()
