"""Stage-level attribution of the JVM extraction backend's N→4N scaling
gap (r4 VERDICT ask #8: "pairing efficiency ≥ 0.7 OR a stage-timing
table pinning the cost").

Runs annotate(extraction="jvm", build_graph=False) on the same synthetic
corpus at 2 and 8 taskset-pinned cores (the scaling bench's pairing),
one untimed warm-up + one timed rep per level, with the Spark UI REST
API enabled, then reads /api/v1/applications/{app}/stages and keeps only
the timed rep's stages (stageId > the pre-rep watermark). For each stage
it records wall-clock (completion - firstTaskLaunched) and summed
executorRunTime; matching stages across levels by submission order gives
a per-stage efficiency table:

    eff_wall = wall_2core / (4 × wall_8core)   (1.0 = perfect scaling)
    inflation = runTime_8core / runTime_2core  (>1 = the WORK grew)

Paste the printed table into BENCH/BASELINE.md.

Usage: python tools/jvm_stage_attribution.py [n_turns] [backend]
(default 400000 jvm; backend "python" attributes the pandas path)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, sys, time, urllib.request
sys.path.insert(0, "@@REPO@@")
from biosd_feature_annotator_spark.session import get_spark
from biosd_feature_annotator_spark.synth import synth_transcripts, bench_lexicon
from biosd_feature_annotator_spark.plans.pipeline import annotate
from pyspark.sql import functions as F

cores, n_turns, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
backend = sys.argv[4] if len(sys.argv) > 4 else "jvm"
spark = get_spark(
    master=f"local[{cores}]", app_name=f"attr-{backend}-{cores}",
    shuffle_partitions=cores,
    extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(port)},
)
lex = bench_lexicon(5000)
tr = synth_transcripts(spark, n_turns, rich_rate=0.5, filler_words=40)
tr.persist(); tr.count()

def run():
    return annotate(spark, tr, lex, build_graph=False, repartition=0,
                    extraction=backend)["triples"].groupBy().agg(
        F.count("*").alias("n")).collect()[0]["n"]

run()  # warm-up (grammar/codegen compile + JIT)
spark.catalog.clearCache()

api = f"http://localhost:{port}/api/v1"
app_id = spark.sparkContext.applicationId
def stages():
    with urllib.request.urlopen(f"{api}/applications/{app_id}/stages?status=complete") as r:
        return json.loads(r.read())

watermark = max((s["stageId"] for s in stages()), default=-1)
t0 = time.time()
n = run()
wall_total = time.time() - t0

from datetime import datetime
def ms(ts):  # "2026-08-17T12:34:56.789GMT"
    return datetime.strptime(ts.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f").timestamp()

rows = []
for s in sorted(stages(), key=lambda s: s["stageId"]):
    if s["stageId"] <= watermark:
        continue
    wall = None
    if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
        wall = round(ms(s["completionTime"]) - ms(s["firstTaskLaunchedTime"]), 2)
    rows.append({
        "stageId": s["stageId"],
        "name": s["name"].split("\n")[0][:60],
        "numTasks": s["numTasks"],
        "wall_sec": wall,
        "run_sec": round(s["executorRunTime"] / 1000.0, 2),
        "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
        "shuffle_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
        "gc_sec": round(s.get("jvmGcTime", 0) / 1000.0, 2),
        "cpu_sec": round(s.get("executorCpuTime", 0) / 1e9, 2),
        "mem_spill_mb": round(s.get("memoryBytesSpilled", 0) / 1e6, 1),
    })
print("@@RESULT@@" + json.dumps({
    "cores": cores, "n_triples": n, "wall_total": round(wall_total, 2),
    "stages": rows,
}))
spark.stop()
"""


def run_level(cores: int, n_turns: int, script: str, port: int,
              backend: str = "jvm") -> dict:
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable, script,
           str(cores), str(n_turns), str(port), backend]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True,
                         cwd=REPO)
    for line in out.stdout.splitlines():
        if line.startswith("@@RESULT@@"):
            return json.loads(line[len("@@RESULT@@"):])
    raise RuntimeError(f"no result line:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    backend = sys.argv[2] if len(sys.argv) > 2 else "jvm"
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(WORKER.replace("@@REPO@@", REPO))
        script = f.name
    lo = run_level(2, n_turns, script, 4051, backend)
    hi = run_level(8, n_turns, script, 4052, backend)
    assert lo["n_triples"] == hi["n_triples"]
    print(json.dumps({"backend": backend, "n_turns": n_turns, "n_triples": lo["n_triples"],
                      "wall_2c": lo["wall_total"], "wall_8c": hi["wall_total"],
                      "eff_total": round(lo["wall_total"] / (4 * hi["wall_total"]), 3)}))
    print(f"{'stage (2c id/8c id)':<58} {'tasks':>5} {'wall2':>7} {'wall8':>7} "
          f"{'eff':>5} {'run2':>7} {'run8':>7} {'infl':>5} {'gc2':>5} {'gc8':>5} {'cpu8':>7} {'spill8':>7}")
    for a, b in zip(lo["stages"], hi["stages"]):
        eff = (round(a["wall_sec"] / (4 * b["wall_sec"]), 2)
               if a["wall_sec"] and b["wall_sec"] else None)
        infl = (round(b["run_sec"] / a["run_sec"], 2) if a["run_sec"] else None)
        print(f"{a['name'][:44] + ' (' + str(a['stageId']) + '/' + str(b['stageId']) + ')':<58} "
              f"{b['numTasks']:>5} {a['wall_sec']:>7} {b['wall_sec']:>7} "
              f"{str(eff):>5} {a['run_sec']:>7} {b['run_sec']:>7} {str(infl):>5} "
              f"{a.get('gc_sec', 0):>5} {b.get('gc_sec', 0):>5} "
              f"{b.get('cpu_sec', 0):>7} {b.get('mem_spill_mb', 0):>7}")


if __name__ == "__main__":
    main()
