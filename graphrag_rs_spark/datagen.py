"""Deterministic synthetic transcript generator (seed=42, pure Python).

Produces the input table mandated by BASELINE.json input_hint:
    (conv_id: string, turn_idx: int32, role: string, text: string,
     tool: string, ts: timestamp)

Texts embed the exact sentence templates the reference's own tests assert
on (FIXTURES.md §3), so the oracle's expected entity/triple sets are rich
and known.  Turn counts are heavy-tailed (Zipf-ish, 1..max_turns) to
exercise conversation-length skew.

No external data; everything derives from the seed.
"""

from __future__ import annotations

import datetime as dt
import os
import random

FIRST_NAMES = ["John", "Alice", "Robert", "Maria", "David", "Sarah", "Tom",
               "Emma", "James", "Olivia", "Peter", "Laura", "Samuel",
               "Grace", "Henry", "Nora", "Walter", "Clara", "Martin", "Ruth"]
LAST_NAMES = ["Smith", "Johnson", "Anderson", "Thompson", "Harrison",
              "Bradford", "Carlson", "Whitley", "Hampton", "Sherman",
              "Watson", "Crawford", "Bentley", "Stanton", "Mason",
              "Dickson", "Walton", "Hudson", "Marley", "Preston"]
# Typo variants for canonicalization probes (lev ≤ 2 of a real first name)
TYPO_FIRST = {"John": ["Jon", "Jhon"], "Robert": ["Robbert"],
              "Sarah": ["Sara"], "Maria": ["Mariah"]}
ORG_STEMS = ["Acme", "Globex", "Initech", "Umbrella", "Stark", "Wayne",
             "Hooli", "Vandelay", "Wonka", "Cyberdyne", "Tyrell", "Aperture"]
ORG_SUFFIXES = ["Inc", "Corp", "LLC", "Ltd"]
UNIVERSITY_PLACES = ["Cambridge", "Toronto", "Geneva", "Melbourne", "Austin"]
LOCATIONS = ["New York", "California", "London", "Paris", "Tokyo", "Berlin",
             "Washington", "Boston", "Chicago", "United States"]
TITLES = ["Dr.", "Prof.", "Mr.", "Mrs."]
TOOLS = ["", "", "", "search", "calculator", "code_interpreter", "browser"]
ROLES = ["user", "assistant", "system", "tool"]

FILLER = (
    "the quick brown fox jumps over the lazy dog and then sits quietly "
    "under a tree while rain falls softly on the distant hills of nowhere "
    "waiting for the evening light to fade into a calm and ordinary night"
).split()


def _person(rng: random.Random) -> str:
    first = rng.choice(FIRST_NAMES)
    if first in TYPO_FIRST and rng.random() < 0.25:
        first = rng.choice(TYPO_FIRST[first])
    return f"{first} {rng.choice(LAST_NAMES)}"


def _org(rng: random.Random) -> str:
    return f"{rng.choice(ORG_STEMS)} {rng.choice(ORG_SUFFIXES)}"


def _sentence(rng: random.Random) -> str:
    """One synthetic turn sentence; templates mirror FIXTURES.md §3."""
    roll = rng.random()
    if roll < 0.14:
        return f"{_person(rng)} works for {_org(rng)} in {rng.choice(LOCATIONS)}."
    if roll < 0.26:
        return (f"{rng.choice(TITLES)} {_person(rng)} is a professor at the "
                f"University of {rng.choice(UNIVERSITY_PLACES)}.")
    if roll < 0.36:
        return f"{_org(rng)} is headquartered in {rng.choice(LOCATIONS)}."
    if roll < 0.44:
        return f"{_person(rng)} was born in {rng.choice(LOCATIONS)}."
    if roll < 0.52:
        return f"{_person(rng)} founded {_org(rng)}."
    if roll < 0.58:
        return f"{_person(rng)} married {_person(rng)}."
    if roll < 0.64:
        return f"{_person(rng)} is a colleague of {_person(rng)}."
    if roll < 0.70:
        return f"{_person(rng)} lives in {rng.choice(LOCATIONS)}."
    # stop-word-heavy filler: should extract nothing (negative case)
    k = rng.randint(6, 18)
    return " ".join(rng.choice(FILLER) for _ in range(k)) + "."


def _turn_text(rng: random.Random) -> str:
    return " ".join(_sentence(rng) for _ in range(rng.randint(1, 3)))


def _turns_for_conv(rng: random.Random, max_turns: int) -> int:
    """Heavy-tailed (approx. Zipf) turn count in [1, max_turns]."""
    u = rng.random()
    n = int(1.0 / max(u, 1e-9) ** 0.9)
    return max(1, min(n, max_turns))


def generate_rows(n_convs: int, seed: int = 42, max_turns: int = 500) -> list[dict]:
    rng = random.Random(seed)
    base_ts = dt.datetime(2025, 1, 1, 0, 0, 0)
    rows: list[dict] = []
    for c in range(n_convs):
        conv_id = f"conv_{c:06d}"
        n_turns = _turns_for_conv(rng, max_turns)
        for t in range(n_turns):
            role = ROLES[t % 2] if rng.random() < 0.9 else rng.choice(ROLES)
            tool = rng.choice(TOOLS) if role in ("assistant", "tool") else ""
            rows.append({
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": _turn_text(rng),
                "tool": tool,
                "ts": base_ts + dt.timedelta(minutes=c * 30, seconds=t * 7),
            })
    return rows


SCALES = {
    # name: (n_convs, max_turns)
    "tiny": (50, 40),
    "small": (2000, 120),
    "bench": (50000, 300),
}


def arrow_schema():
    import pyarrow as pa
    return pa.schema([
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ])


def write_parquet(path: str, n_convs: int, seed: int = 42,
                  max_turns: int = 500) -> int:
    """Write transcripts to a parquet file; returns row count."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    rows = generate_rows(n_convs, seed=seed, max_turns=max_turns)
    cols = {k: [r[k] for r in rows] for k in
            ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    table = pa.Table.from_pydict(cols, schema=arrow_schema())
    # atomic publish: the ensure_* callers gate on os.path.exists, so a
    # writer killed mid-write (bench children DO get OOM-killed) must
    # not leave a truncated file at the final path — every later run
    # would "see" the cache and fail reading it
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp, compression="snappy")
    os.replace(tmp, path)
    return len(rows)


def ensure_transcripts(n_convs: int, max_turns: int = 120, seed: int = 42,
                       data_dir: str = "/root/repo/data") -> str:
    """Idempotently materialize transcripts at an arbitrary size; returns
    the parquet path (benchmarks read this instead of driver-side lists)."""
    import os
    path = os.path.join(
        data_dir, f"transcripts_c{n_convs}_t{max_turns}_s{seed}.parquet")
    if not os.path.exists(path):
        os.makedirs(data_dir, exist_ok=True)
        write_parquet(path, n_convs, seed=seed, max_turns=max_turns)
    return path


def ensure_scale(scale: str, data_dir: str = "/root/repo/data") -> str:
    """Idempotently materialize a named scale; returns the parquet path."""
    import os
    n_convs, max_turns = SCALES[scale]
    path = os.path.join(data_dir, f"transcripts_{scale}.parquet")
    if not os.path.exists(path):
        os.makedirs(data_dir, exist_ok=True)
        write_parquet(path, n_convs, seed=42, max_turns=max_turns)
    return path


if __name__ == "__main__":
    import sys
    scale = sys.argv[1] if len(sys.argv) > 1 else "small"
    p = ensure_scale(scale)
    print(p)
