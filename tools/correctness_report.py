#!/usr/bin/env python3
"""Turn `tools/compare.py` output into a JSON artifact recording a
differential-correctness run at a given scale factor.

Usage: correctness_report.py compare_output.txt sf_label [out.json]
"""
import json
import re
import sys


def main() -> None:
    lines = open(sys.argv[1]).read().splitlines()
    queries = {}
    for ln in lines:
        m = re.match(r"(PASS|FAIL) (\S+)(?: \((\d+) rows\))?", ln)
        if m:
            queries[m.group(2)] = {
                "status": m.group(1).lower(),
                **({"rows": int(m.group(3))} if m.group(3) else {}),
                **({} if m.group(1) == "PASS" else
                   {"detail": ln.split(": ", 1)[-1]}),
            }
    npass = sum(1 for q in queries.values() if q["status"] == "pass")
    out = {
        "sf": sys.argv[2],
        "pass": npass,
        "fail": len(queries) - npass,
        "queries": queries,
    }
    if len(sys.argv) > 3:
        json.dump(out, open(sys.argv[3], "w"), indent=1)
    print(f"{out['pass']} pass, {out['fail']} fail at {out['sf']}")


if __name__ == "__main__":
    main()
