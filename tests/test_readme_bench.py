"""README throughput cell is generated from the newest BENCH JSON
(scripts/readme_bench.py) — these tests pin the no-drift contract (VERDICT
r3 weak-item 3: the hand-edited README band and the driver-captured
BENCH_r0N.json diverged across rounds)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, 'scripts', 'readme_bench.py')


def _run(*argv, **kw):
    return subprocess.run(
        [sys.executable, SCRIPT, *argv],
        capture_output=True,
        text=True,
        env={**os.environ, 'PYTHONPATH': REPO},
        **kw,
    )


def test_readme_matches_latest_bench_json():
    """--check passes against the checked-in README: the committed cell was
    generated from the newest committed BENCH_r*.json."""
    proc = _run('--check')
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_check_detects_stale_readme(tmp_path):
    """--check must fail when the README cell was generated from a
    different capture (a fabricated newer JSON)."""
    fake = tmp_path / 'BENCH_r99.json'
    fake.write_text(
        json.dumps(
            {
                'parsed': {
                    'metric': 'EDF->hypnogram inference throughput',
                    'value': 123456.0,
                    'unit': 'recordings/hour/chip',
                    'vs_baseline': 197.5,
                    'pipeline': 'q8',
                    'precision': 'bfloat16',
                    'source_rates': 'offgrid',
                    'link_h2d_MBps': 250.0,
                    'link_d2h_MBps': 240.0,
                }
            }
        )
    )
    proc = _run('--check', '--json', str(fake))
    assert proc.returncode == 1, proc.stdout + proc.stderr
    assert 'stale' in proc.stderr


def test_rewrite_roundtrip(tmp_path):
    """Rewriting from the same JSON is a no-op; rewriting from a different
    one changes exactly the fenced cell and --check then passes on it."""
    with open(os.path.join(REPO, 'README.md')) as f:
        original = f.read()
    try:
        proc = _run()
        assert proc.returncode == 0, proc.stdout + proc.stderr
        assert 'already current' in proc.stdout
        fake = tmp_path / 'BENCH_r99.json'
        fake.write_text(
            json.dumps(
                {
                    'metric': 'x',
                    'value': 50000.0,
                    'unit': 'recordings/hour/chip',
                    'vs_baseline': 80.0,
                    'link_h2d_MBps': 300.0,
                    'link_d2h_MBps': 280.0,
                }
            )
        )
        proc = _run('--json', str(fake))
        assert proc.returncode == 0, proc.stdout + proc.stderr
        with open(os.path.join(REPO, 'README.md')) as f:
            rewritten = f.read()
        assert '50,000 recordings/hour/chip' in rewritten
        assert 'link calibration 300 MB/s H2D' in rewritten
        # Only the fenced cell moved.
        assert rewritten.split('<!--bench-->')[0] == original.split('<!--bench-->')[0]
        assert rewritten.split('<!--/bench-->')[1] == original.split('<!--/bench-->')[1]
        proc = _run('--check', '--json', str(fake))
        assert proc.returncode == 0, proc.stdout + proc.stderr
    finally:
        with open(os.path.join(REPO, 'README.md'), 'w') as f:
            f.write(original)
