"""Summarize a jax.profiler trace: top device ops with source attribution.

Usage: python tools/trace_report.py /tmp/jaxtrace [top_n] [iters]
"""
import collections
import glob
import gzip
import json
import sys


def main():
    root = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    files = sorted(glob.glob(f'{root}/plugins/profile/*/*.trace.json.gz'))
    assert files, f'no trace under {root}'
    with gzip.open(files[-1]) as fh:
        data = json.load(fh)
    events = data.get('traceEvents', [])
    pid_names = {e['pid']: e['args'].get('name', '') for e in events
                 if e.get('ph') == 'M' and e.get('name') == 'process_name'}
    dev = {p for p, n in pid_names.items() if 'TPU' in n}
    durs = collections.defaultdict(float)
    cnt = collections.Counter()
    src = {}
    for e in events:
        if e.get('ph') == 'X' and e.get('pid') in dev:
            n = e.get('name', '')
            durs[n] += e.get('dur', 0)
            cnt[n] += 1
            a = e.get('args') or {}
            if n not in src and ('source' in a or 'tf_op' in a):
                src[n] = (a.get('source', '').split('/')[-1],
                          a.get('tf_op', '')[:70])
    total = sum(d for n, d in durs.items() if not n.startswith('jit_'))
    print(f'device total (non-jit rows): {total / iters / 1000:.1f} ms/iter')
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:top_n]:
        s = src.get(name, ('', ''))
        print(f'{d / iters / 1000:8.2f} ms x{cnt[name] // iters:<4d} '
              f'{name[:26]:26s} {s[0][:40]:40s} {s[1]}')


if __name__ == '__main__':
    main()
