"""Deterministic transcript synthesizer (FIXTURES.md §1).

Two generators:

- ``golden_transcripts`` — the ~40 frozen golden cases (FIXTURES.md §3)
  as a tiny DataFrame: conv g<case>, turn 0 = neutral filler, turn 1 = the
  case sentence. This is the P/R≥0.95 correctness corpus mirroring the
  reference's extractor unit tests (SURVEY.md §5.1).

- ``synth_transcripts`` — an arbitrarily large transcript table built from
  ``spark.range`` with *pure Catalyst expressions* (xxhash64-derived
  choices): no driver-side loop, no Python in the hot path, so the
  10^6-turn bench corpus generates in seconds and the same code would
  synthesize 10^12 turns on a cluster. Content is seeded with extractable
  sentences (numbers/units/dates/organisms) at a fixed rate so bench
  throughput measures real extraction work, not empty scans.

Everything is a deterministic function of (seed, row index): identical
output at any parallelism (BASELINE.md determinism row).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

_WORDS = [
    "the", "report", "covers", "general", "topics", "and", "plain", "filler",
    "words", "about", "shipping", "logistics", "summary", "notes", "review",
    "context", "detail", "update", "status", "pending", "complete", "draft",
]
_ROLES_TOOL_NAMES = ["search", "calc", "lookup", "fetch"]

# extractable sentence templates; <N>/<M> are hash-derived integers
_RICH = [
    "measured <N> kg at intake",
    "patients aged <N> to <M> years",
    "the sample organism is Homo sapiens",
    "collected on 2019-03-<D2> from site B",
    "dose <N>-<M> administered",
    "we used mus musculus strains",
    "count = <N> recorded since 1998 continuously",
    "subject: human donor, aged <N> weeks",
]

_EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z


def bench_lexicon(n_extra: int = 5000):
    """The golden lexicon extended with n_extra deterministic synthetic
    ontology terms (two-token pseudo-Latin labels + one synonym each).
    Production entity dictionaries are 10^3-10^6 surfaces, not 14 — bench
    and scaling runs use this so the mention-scan cost per byte reflects
    a real deployment. Golden correctness tests keep the frozen lexicon."""
    import hashlib

    from .sources.lexicon import Lexicon, load_lexicon

    base = load_lexicon(os.path.join(GOLDEN_DIR, "lexicon.json"))
    syll = ["ba", "co", "du", "fe", "gi", "ha", "ju", "ka", "lo", "mu",
            "ne", "pi", "qo", "ru", "sa", "ti"]

    def word(seed: str) -> str:
        h = hashlib.md5(seed.encode()).digest()
        return "".join(syll[b % 16] for b in h[:4])

    terms = list(base.terms)
    for i in range(n_extra):
        label = f"{word(f'a{i}')} {word(f'b{i}')}"
        terms.append(
            {
                "term_id": f"SYN_{i:06d}",
                "iri": f"synth://term/{i}",
                "label": label,
                "synonyms": [word(f"c{i}") + word(f"d{i}")],
                "pred": "hasEntity",
            }
        )
    return Lexicon(terms=terms)


def golden_cases() -> list[dict]:
    with open(os.path.join(GOLDEN_DIR, "golden_triples.json")) as f:
        return json.load(f)["cases"]


def golden_transcripts(spark: SparkSession) -> DataFrame:
    """The frozen golden corpus: 2 turns per case conv."""
    rows = []
    for i, case in enumerate(golden_cases()):
        base = _EPOCH_2024 + 1000 * i
        rows.append((case["id"], 0, "user", "please log the following detail", None, base))
        rows.append((case["id"], 1, "assistant", case["text"], None, base + 37))
    # structural fixtures (FIXTURES.md §3.7)
    rows.append(("g38", 0, "user", "", None, _EPOCH_2024 + 90000))
    rows.append(("g38", 1, "assistant", None, None, _EPOCH_2024 + 90037))
    rows.append(("g42", 0, "tool", "tool invocation output follows", "search", _EPOCH_2024 + 91000))
    # g39/g40: the same entity via 3 surface forms over exactly 100 turns
    # across 3 convs → 100 hasOrganism triples, one canonical node with
    # n_mentions=100 and aliases ⊇ {human, homo sapiens, h. sapiens}
    surfs = ["human", "Homo sapiens", "h. sapiens"]
    k = 0
    for c, n_t in enumerate((34, 33, 33)):
        for t in range(n_t):
            rows.append(
                (f"g39_{c}", t, "user" if t % 2 == 0 else "assistant",
                 f"donor is {surfs[k % 3]} as noted", None,
                 _EPOCH_2024 + 95000 + 10000 * c + 37 * t)
            )
            k += 1
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts_s long"
    )
    return df.select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.timestamp_seconds("ts_s").alias("ts"),
    )


def _pick(arr: list[str], h) -> F.Column:
    """Deterministic element choice from a literal array by hash column."""
    lit_arr = F.array(*[F.lit(w) for w in arr])
    return F.element_at(lit_arr, (F.pmod(h, F.lit(len(arr))) + 1).cast("int"))


def synth_transcripts(
    spark: SparkSession,
    n_turns: int,
    rich_rate: float = 0.3,
    partitions: int | None = None,
    filler_words: int = 7,
) -> DataFrame:
    """~n_turns synthetic turns, generated distributively.

    Conversations occupy fixed blocks of 8 global slots; each conv keeps
    its first 2 + (xxhash64(conv_no) mod 7) slots, giving 2-8 turns/conv
    (FIXTURES.md §1) with an exact closed-form slot→(conv, turn) map —
    the trick that makes generation embarrassingly parallel.
    """
    n_slots = int(n_turns * 8 / 5.5) + 8  # E[len]=5.5 of 8 slots kept
    rng = spark.range(0, n_slots, 1, partitions or spark.sparkContext.defaultParallelism)
    g = F.col("id")
    conv_no = (g / 8).cast("long")
    turn_idx = F.pmod(g, F.lit(8)).cast("int")
    conv_len = (F.pmod(F.xxhash64(conv_no, F.lit(1)), F.lit(7)) + 2).cast("int")

    h = lambda salt: F.pmod(F.xxhash64(g, F.lit(salt)), F.lit(1_000_000_007))  # noqa: E731

    # filler_words controls realism: 7 ≈ terse labels (tests), 40+ ≈ real
    # conversational turns (bench) — extraction cost scales with text length
    filler = F.concat_ws(
        " ", *[_pick(_WORDS, h(10 + i)) for i in range(filler_words)]
    )
    n1 = F.pmod(h(20), F.lit(90)) + 1
    n2 = n1 + F.pmod(h(21), F.lit(50)) + 1
    d2 = F.lpad((F.pmod(h(22), F.lit(28)) + 1).cast("string"), 2, "0")
    rich = _pick(_RICH, h(23))
    rich = F.replace(rich, F.lit("<N>"), n1.cast("string"))
    rich = F.replace(rich, F.lit("<M>"), n2.cast("string"))
    rich = F.replace(rich, F.lit("<D2>"), d2)
    text = F.when(
        F.pmod(h(24), F.lit(1000)) < F.lit(int(rich_rate * 1000)),
        F.concat_ws(" ", filler, rich),
    ).otherwise(filler)

    is_tool = F.pmod(h(30), F.lit(10)) == 0  # 10% tool turns
    role = (
        F.when(is_tool, F.lit("tool"))
        .when(turn_idx % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )
    tool = F.when(is_tool, _pick(_ROLES_TOOL_NAMES, h(31))).otherwise(F.lit(None).cast("string"))

    return (
        rng.where(turn_idx < conv_len)
        .select(
            F.concat(F.lit("c"), F.lpad(conv_no.cast("string"), 10, "0")).alias("conv_id"),
            turn_idx.alias("turn_idx"),
            role.alias("role"),
            text.alias("text"),
            tool.alias("tool"),
            F.timestamp_seconds(F.lit(_EPOCH_2024) + g * 37).alias("ts"),
        )
    )
