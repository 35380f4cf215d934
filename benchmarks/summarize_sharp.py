#!/usr/bin/env python3
"""Print rung deltas from a sharp-harness JSON (ablate_sharp / probe_*_sharp).

Usage: python benchmarks/summarize_sharp.py <file.json> [rung order ...]
Defaults to the file's own key order. Deltas are net-of-null best times.
"""

import json
import sys


def main():
    path = sys.argv[1]
    d = json.load(open(path))
    meta = d.pop("_meta", {})
    order = sys.argv[2:] or [k for k in d if k != "null"]
    print(f"{path}  null={meta.get('null_ms', d.get('null', {}).get('best_ms', 0))}")
    prev = 0.0
    for k in order:
        if k not in d:
            continue
        net = d[k]["net_ms"]
        print(f"{k:>14}: net {net:7.4f} ms  (+{net - prev:7.4f})  raw {d[k]['raw']}")
        prev = net


if __name__ == "__main__":
    main()
