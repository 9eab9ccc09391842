"""Regenerate the README perf table from committed bench logs.

Every chip artifact in bench_logs/ ends with one JSON result line
(enforced by scripts/benchlog.py); this script collects the headline
metrics from those lines and prints a markdown table against the
reference timings recorded in bench_logs/bench_reference_snapshot.json,
so the README numbers can never drift from the logs they cite.

Usage: python scripts/perf_table.py           # print the table
"""
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOGS = os.path.join(ROOT, 'bench_logs')

# headline rows: (label, log file, reference key or None)
ROWS = [
    ('order-6 sweep fwd+grad', 'bench_order6_r5.log', 'order6_grid256'),
    ('order-20 fwd+grad', 'bench_order20_r5.log', 'order20_grid256'),
    # 156.5 s/solve is the reference's own committed Example3.ipynb
    # timing (Xeon Gold 5118), not a this-host measurement
    ('order-20 forward (Example3)', 'example3_parity_r5.log', 156.5),
    ('order-25 fwd+grad (north star)', 'bench_order25_r5.log',
     'order25_grid256'),
]


def last_json(path):
    out = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith('{') and '"metric"' in line:
                try:
                    out = json.loads(line)
                except json.JSONDecodeError:
                    pass
    return out


def main():
    with open(os.path.join(LOGS, 'bench_reference_snapshot.json')) as f:
        ref = json.load(f)
    print('| workload | this framework (1x v5e) | reference (host CPU) '
          '| speedup | log |')
    print('|---|---|---|---|---|')
    bad = 0
    for label, log, ref_key in ROWS:
        path = os.path.join(LOGS, log)
        if not os.path.exists(path):
            print(f'| {label} | MISSING {log} | | | |')
            bad += 1
            continue
        j = last_json(path)
        if j is None:
            # pre-benchlog artifacts carry "N solves in T s (X s/solve)"
            import re
            m = None
            with open(path) as f:
                for line in f:
                    m = re.search(r'\(([\d.]+) s/solve\)', line) or m
            if m is None:
                print(f'| {label} | NO RESULT in {log} | | | |')
                bad += 1
                continue
            j = {'value': float(m.group(1)), 'unit': 's/solve'}
        val, unit = j['value'], j.get('unit', '')
        rv = ref[ref_key] if isinstance(ref_key, str) else ref_key
        print(f'| {label} | {val:g} {unit} | {rv:.4g} s/solve | '
              f'**{rv / val:.0f}x** | `{log}` |')
    sys.exit(1 if bad else 0)


if __name__ == '__main__':
    main()
