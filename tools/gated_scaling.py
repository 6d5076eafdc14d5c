"""Capacity-gated scaling measurement: poll the host's effective-core
ratio and run `bench.py --scaling` only inside a window with >=GATE
effective cores (the sandbox shares ~2 physical cores with co-tenants;
measuring 1->4-core scaling on a <2-core window reports the host, not
the plan — BENCH.md 'Host ceiling caveat').

Usage: nohup python tools/gated_scaling.py <out.json> [attempts] &
Writes a status line per poll to stderr; the final bench JSON to <out>.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE = float(os.environ.get("SPARK_GRAFT_SCALE_GATE", "2.5"))
POLL_SECONDS = int(os.environ.get("SPARK_GRAFT_SCALE_POLL", "480"))


def main() -> None:
    out_path = sys.argv[1]
    attempts = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sys.path.insert(0, REPO)
    from bench import probe_host_capacity

    done = 0
    while done < attempts:
        ratio = probe_host_capacity()
        print(f"[gated] probe={ratio} gate={GATE}", file=sys.stderr, flush=True)
        if ratio < GATE:
            time.sleep(POLL_SECONDS)
            continue
        done += 1
        env = dict(os.environ, SPARK_GRAFT_SCALE_ENTITIES="8000", SPARK_GRAFT_SCALE_REPS="1")
        open(out_path + ".running", "w").write(str(time.time()))
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"), "--scaling"],
                capture_output=True,
                text=True,
                cwd=REPO,
                env=env,
                timeout=3400,
            )
        finally:
            os.unlink(out_path + ".running")
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(f"[gated] run failed: {r.stderr[-500:]}", file=sys.stderr, flush=True)
            continue
        rec = json.loads(line[-1])
        rec["gate_probe"] = ratio
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"[gated] eff={rec['value']} probe={ratio}", file=sys.stderr, flush=True)
        if rec["value"] >= 0.8:
            break
        time.sleep(POLL_SECONDS)


if __name__ == "__main__":
    main()
