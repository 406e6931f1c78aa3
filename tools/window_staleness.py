"""Driver-window staleness report (VERDICT r12 task 5).

The driver's external correctness gate samples ~50 of the 258 catalog
entries per round; the right window-selection criterion is STALENESS:
an entry whose registration code was touched AFTER its last external
hash-green row is unverified-as-written. This tool emits, per entry:

- ``last_green_round``: highest round N with a hash-green row in
  CORRECTNESS_rN.json (rows-only greens are tracked separately and
  never count as hash-green).
- ``last_green_ts``: commit time of that round's artifact (the closest
  timestamp the repo has for when the external check ran).
- ``last_touch_ts`` / ``last_touch_commit``: newest commit over the
  entry's OWN source lines — ``git blame -L`` across the registered
  function including its @register decorator (so oracle-SQL edits
  count), not the whole file (the r10 package split touched every
  file; line-level blame sees through it).
- ``stale``: touched after last green (or never externally green).

Sorted stale-first, then oldest-green-first — the top of the list IS
the next round's window.

Usage: python tools/window_staleness.py [--json OUT.json] [top_n]
"""

from __future__ import annotations

import glob
import inspect
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", REPO, *args], capture_output=True, text=True, check=False
    ).stdout


def _blame_last_touch(path: str, start: int, end: int) -> tuple[int, str]:
    """(max committer-time, its short hash) over [start, end] of path."""
    # -M/-C follow intra-repo moves (the r10 package split relocated
    # every entry); a merely-moved line keeps its original commit.
    out = _git(
        "blame", "--line-porcelain", "-M", "-C", "-C",
        "-L", f"{start},{end}", "--", path,
    )
    best_ts, best_sha = 0, ""
    sha = ""
    for line in out.splitlines():
        if re.match(r"^[0-9a-f]{40} ", line):
            sha = line.split()[0]
        elif line.startswith("committer-time "):
            ts = int(line.split()[1])
            if ts > best_ts:
                best_ts, best_sha = ts, sha[:9]
    return best_ts, best_sha


def main() -> None:
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    top_n = int(args[0]) if args else 50

    from kafka_streams_demo_spark import catalog

    # round -> (artifact commit time, green-entry set)
    rounds: dict[int, tuple[int, set, set]] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        n = int(re.search(r"_r(\d+)\.json$", f).group(1))
        ts_s = _git("log", "-1", "--format=%ct", "--", os.path.basename(f))
        ts = int(ts_s.strip() or 0)
        with open(f) as fh:
            rows = json.load(fh)
        green = {k for k, v in rows.items() if v.get("hash_match") is True}
        rows_only = {
            k for k, v in rows.items()
            if v.get("hash_match") is not True and v.get("rows_match") is True
        }
        rounds[n] = (ts, green, rows_only)

    report = []
    for name, fn in catalog.queries().items():
        try:
            src_file = inspect.getsourcefile(fn)
            lines, start = inspect.getsourcelines(fn)
            rel = os.path.relpath(src_file, REPO)
            touch_ts, touch_sha = _blame_last_touch(
                rel, start, start + len(lines) - 1
            )
        except (OSError, TypeError):
            rel, touch_ts, touch_sha = "?", 0, ""
        lg_round, lg_ts = None, 0
        for n in sorted(rounds):
            ts, green, _ro = rounds[n]
            if name in green:
                lg_round, lg_ts = n, ts
        stale = lg_round is None or touch_ts > lg_ts
        report.append(
            {
                "entry": name,
                "file": rel,
                "last_green_round": lg_round,
                "last_green_ts": lg_ts,
                "last_touch_ts": touch_ts,
                "last_touch_commit": touch_sha,
                "stale": stale,
            }
        )

    report.sort(
        key=lambda r: (
            not r["stale"],
            r["last_green_round"] if r["last_green_round"] is not None else -1,
            -r["last_touch_ts"],
        )
    )
    n_stale = sum(1 for r in report if r["stale"])
    for r in report[:top_n]:
        mark = "STALE" if r["stale"] else "ok   "
        print(
            f"{mark} {r['entry']:40s} green=r{r['last_green_round']} "
            f"touch={r['last_touch_commit']}"
        )
    print(
        f"\n{n_stale}/{len(report)} stale "
        f"(touched after last external green, or never green)"
    )
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(report, fh, indent=2)
        print(f"wrote {json_out}")


if __name__ == "__main__":
    main()
