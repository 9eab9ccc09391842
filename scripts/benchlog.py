"""Fail-loud bench logging: run a command, tee its output to a log, and
REFUSE to leave a resultless log behind.

Round-4 postmortem: a bench run died on the tunnel deadline and its
empty log was committed as if it were evidence (bench_order25_nibble.log,
VERDICT r4 weak #4).  A process killed by SIGKILL cannot guard itself —
the guard lives outside it.  This wrapper:

  * streams the command's combined stdout+stderr to the console AND the
    log file (so partial progress is never lost),
  * after exit, checks the command succeeded AND the log contains the
    result marker (default: the '"metric"' JSON key bench.py prints),
  * on failure renames the log to <log>.failed and exits nonzero, so a
    dead run can never masquerade as a result.

Usage:
    python scripts/benchlog.py bench_logs/foo.log -- python bench.py
    python scripts/benchlog.py --key RESULT log.txt -- python scripts/x.py
"""

import argparse
import os
import signal
import subprocess
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--key', default='"metric"',
                    help='substring that must appear in the log for the '
                         'run to count as a result')
    ap.add_argument('log')
    ap.add_argument('cmd', nargs=argparse.REMAINDER,
                    help='-- command to run')
    args = ap.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == '--':
        cmd = cmd[1:]
    if not cmd:
        ap.error('no command given (use: benchlog.py LOG -- CMD ...)')

    os.makedirs(os.path.dirname(os.path.abspath(args.log)), exist_ok=True)

    # If benchlog itself is SIGTERM'd (e.g. an outer `timeout` fires) the
    # post-run marker check below never executes and a resultless .log
    # survives — rename-on-signal closes that hole.  SIGKILL can't be
    # caught; the .failed rename then falls to the next committer's
    # `git add` review, so prefer `timeout` (SIGTERM) over `timeout -s9`.
    def _on_term(signum, frame):
        try:
            proc.terminate()
        except Exception:
            pass
        if os.path.exists(args.log):
            os.replace(args.log, args.log + '.failed')
        print(f'benchlog: killed by signal {signum}; log moved to '
              f'{args.log}.failed', file=sys.stderr)
        sys.exit(1)

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    rc = 1
    with open(args.log, 'w') as f:
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True,
                                bufsize=1)
        for line in proc.stdout:
            sys.stdout.write(line)
            sys.stdout.flush()
            f.write(line)
            f.flush()
        rc = proc.wait()

    with open(args.log) as f:
        has_result = args.key in f.read()
    if rc != 0 or not has_result:
        failed = args.log + '.failed'
        os.replace(args.log, failed)
        print(f'benchlog: run FAILED (exit={rc}, '
              f'result marker {args.key!r} '
              f'{"present" if has_result else "MISSING"}); '
              f'log moved to {failed}', file=sys.stderr)
        sys.exit(1)
    print(f'benchlog: result captured in {args.log}')


if __name__ == '__main__':
    main()
