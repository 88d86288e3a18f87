#!/usr/bin/env python3
"""Regenerate README.md's measured numbers from round artifacts instead of
hand-editing them (they drifted two rounds running — r6 #4, r7 #1):

  - query count + bench total  <- BENCH_FULL.json (the working bench dump)
  - spec count                 <- target/test_summary.log, captured via
                                  `sbt test 2>&1 | tee target/test_summary.log`
                                  (falls back to leaving the line untouched)

Run at round close, after the final bench + test runs:
  python3 tools/gen_readme.py
"""
import json, os, re, sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

def main():
    bench = json.load(open(f"{ROOT}/BENCH_FULL.json"))
    nq, total = len(bench["queries"]), bench["value"]
    heavy = max(bench["queries"].values())

    specs = None
    log_path = f"{ROOT}/target/test_summary.log"
    if os.path.exists(log_path):
        m = re.search(r"Total number of tests run: (\d+)", open(log_path).read())
        if m:
            specs = m.group(1)

    readme = open(f"{ROOT}/README.md").read()
    orig = readme
    readme = re.sub(r"\(\d+ entries\)", f"({nq} entries)", readme)
    readme = re.sub(r"\d+ queries, total ≈\d+(\.\d+)? s",
                    f"{nq} queries, total ≈{total:.0f} s", readme)
    readme = re.sub(r"heaviest single queries ≈\d+(\.\d+)? s",
                    f"heaviest single queries ≈{heavy:.1f} s", readme)
    if specs:
        readme = re.sub(r"# \d+ specs", f"# {specs} specs", readme)

    if readme != orig:
        open(f"{ROOT}/README.md", "w").write(readme)
    print(f"README: {nq} queries, ≈{total:.0f}s bench, "
          f"{specs or '(spec count unchanged: no test_summary.log)'} specs, "
          f"heaviest ≈{heavy:.1f}s — {'updated' if readme != orig else 'already current'}")

if __name__ == "__main__":
    main()
