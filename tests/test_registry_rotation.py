"""Driver-window rotation: the correctness driver oracles only the
first 50 registry entries, so ``all_queries()`` must order queries by
last-driver-checked round ascending (never-checked first). These tests
pin that policy against the CORRECTNESS_r*.json history at repo root.
"""

from __future__ import annotations

import json
from pathlib import Path

from swarm_spark.queries import _last_checked_round, all_queries

ROOT = Path(__file__).resolve().parent.parent
DRIVER_WINDOW = 50


def _newest_correctness() -> dict | None:
    files = sorted(ROOT.glob("CORRECTNESS_r*.json"))
    if not files:
        return None
    return json.loads(files[-1].read_text())


def test_ordering_is_deterministic():
    assert list(all_queries()) == list(all_queries())


def test_never_checked_queries_lead():
    last = _last_checked_round()
    names = list(all_queries())
    never = {n for n in names if n not in last}
    if never:
        assert set(names[: len(never)]) == never


def test_window_covers_unchecked_from_latest_round():
    """Every query without a row in the newest CORRECTNESS file must sit
    inside the driver's 50-query window next round."""
    newest = _newest_correctness()
    if newest is None:
        return
    names = list(all_queries())
    window = set(names[:DRIVER_WINDOW])
    unchecked = [n for n in names if n not in newest]
    missing = [n for n in unchecked if n not in window]
    assert not missing, f"unchecked queries outside driver window: {missing}"


def test_every_query_checked_at_least_every_other_round(tmp_path):
    """Simulate the driver across rounds: each round writes rows for the
    FIRST 50 entries of the rotated order; after any two consecutive
    rounds, every registry query must have at least one row."""
    import json

    from swarm_spark.queries import all_queries

    names = list(all_queries())  # current registry, any starting order

    def rotate(last: dict[str, int]) -> list[str]:
        reg = {n: i for i, n in enumerate(names)}
        return sorted(names, key=lambda n: (last.get(n, -1), reg[n]))

    def write_round(rnd: int, checked: list[str]):
        (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(
            json.dumps({n: {"rows_match": True, "hash_match": True} for n in checked})
        )

    for rnd in range(1, 6):
        last = _last_checked_round(tmp_path)
        order = rotate(last)
        write_round(rnd, order[:DRIVER_WINDOW])
        if rnd >= 2:
            prev = json.loads(
                (tmp_path / f"CORRECTNESS_r{rnd - 1:02d}.json").read_text()
            )
            cur = json.loads(
                (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").read_text()
            )
            missing = set(names) - set(prev) - set(cur)
            assert not missing, f"r{rnd}: never checked in 2 rounds: {missing}"


def test_fallout_was_green_most_recently():
    """Queries displaced past the window must have a green row in the
    round they were last checked (we only defer verified queries)."""
    names = list(all_queries())
    last = _last_checked_round()
    files = {
        int(p.name[len("CORRECTNESS_r") : -len(".json")]): json.loads(p.read_text())
        for p in ROOT.glob("CORRECTNESS_r*.json")
    }
    for n in names[DRIVER_WINDOW:]:
        assert n in last, f"{n} has never been driver-checked yet overflows the window"
        row = files[last[n]][n]
        assert row.get("rows_match") and row.get("hash_match"), (
            f"{n} overflows the window but was not green in r{last[n]}"
        )
