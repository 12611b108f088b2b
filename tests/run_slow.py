"""One-command green slow suite: per-file subprocess runner.

Running all ~300 tests in ONE process can segfault late in the run inside
XLA-CPU's LLVM compile (nondeterministic, observed around test 237/244 —
see BENCH_NOTES "CI durations audit"); every file passes in its own
process. This runner executes each slow-marked test FILE in a fresh
interpreter so `python tests/run_slow.py` is a single green command:

    python tests/run_slow.py            # all slow files
    python tests/run_slow.py -k vocoder # filter files by substring
    python tests/run_slow.py --all      # default suite + slow files

Exit code 0 iff every file passed.
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import time

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TESTS_DIR)


def slow_files() -> list:
    """Test files containing ``pytest.mark.slow`` (module-level or not)."""
    out = []
    for name in sorted(os.listdir(TESTS_DIR)):
        if not (name.startswith("test_") and name.endswith(".py")):
            continue
        src = open(os.path.join(TESTS_DIR, name)).read()
        if re.search(r"\bmark\.slow\b", src):
            out.append(name)
    return out


def default_files() -> list:
    slow = set(slow_files())
    return [
        name
        for name in sorted(os.listdir(TESTS_DIR))
        if name.startswith("test_") and name.endswith(".py") and name not in slow
    ]


def run_file(name: str, extra: list) -> tuple:
    """(passed, seconds, tail) for one file in its own interpreter."""
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", os.path.join("tests", name),
         "-q", "-o", "addopts="] + extra,
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    dt = time.time() - t0
    tail = "\n".join(proc.stdout.strip().splitlines()[-12:])
    return proc.returncode == 0, dt, tail


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="run_slow")
    p.add_argument("-k", default=None, help="substring filter on file names")
    p.add_argument("--all", action="store_true",
                   help="also run the default (non-slow) files, per-file")
    args, extra = p.parse_known_args(argv)

    files = slow_files()
    if args.all:
        files = default_files() + files
    if args.k:
        files = [f for f in files if args.k in f]
    if not files:
        print("no matching test files")
        return 2

    failures = []
    t0 = time.time()
    for i, name in enumerate(files, 1):
        print(f"[{i}/{len(files)}] {name} ...", flush=True)
        ok, dt, tail = run_file(name, extra)
        status = "PASS" if ok else "FAIL"
        print(f"[{i}/{len(files)}] {name}: {status} ({dt:.0f}s)", flush=True)
        if not ok:
            failures.append(name)
            print(tail, flush=True)

    total = time.time() - t0
    if failures:
        print(f"\n{len(failures)}/{len(files)} files FAILED ({total:.0f}s): "
              + " ".join(failures))
        return 1
    print(f"\nall {len(files)} files green ({total:.0f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
