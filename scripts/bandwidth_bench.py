"""Bandwidth-sensitivity bench: 2-process SPDZ Groth16 proves over SHAPED
links (the mahimahi analog, ref mpc-snarks/scripts/bandwidth_bench.zsh +
analysis/data/bad_net.csv: 5.72 / 1.42 / 0.90 s at 1 / 8 / 64 MB/s @2^10).

Each party runs as a real OS process (cli.party groth16) with
CZTPU_LINK_MBPS throttling its ProcNet collectives by bytes/rate.

    python scripts/bandwidth_bench.py [--rates 1,8,64] [--size 1024]

Writes analysis/data/bad_net.csv.
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_rate(rate, size, port):
    hosts = f"/tmp/cz_bw_{port}.json"
    with open(hosts, "w") as f:
        json.dump({"coordinator": f"127.0.0.1:{port}", "parties": 2}, f)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    if rate is not None:
        env["CZTPU_LINK_MBPS"] = str(rate)
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m", "collaborative_zksnark_tpu.cli.party",
                "groth16", "--hosts", hosts, "--party", str(i),
                "--alg", "spdz", "--size", str(size),
            ],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    for i, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"party {i} rc={p.returncode}\n{o[-1500:]}"
    m = re.search(r"End: timed section ([0-9.]+)s", outs[0])
    mb = re.search(r"stats: (\{.*\})", outs[0])
    sent = 0
    if mb:
        try:
            sent = int(eval(mb.group(1)).get("bytes_sent", 0))
        except Exception:
            pass
    return float(m.group(1)), sent


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rates", default="1,8,64")
    ap.add_argument("--size", type=int, default=1024)
    args = ap.parse_args()
    rows = []
    # unshaped baseline first (also warms the persistent compile cache so
    # the shaped rows time protocol + link, not compiles)
    t, sent = run_rate(None, args.size, 12720)
    print(f"lan (unshaped): {t:.3f}s ({sent} B sent by party 0)", flush=True)
    rows.append(("lan", t, sent))
    for i, r in enumerate(args.rates.split(",")):
        t, sent = run_rate(float(r), args.size, 12721 + i)
        print(f"{r} MB/s: {t:.3f}s ({sent} B)", flush=True)
        rows.append((r, t, sent))
    out = os.path.join(REPO, "analysis", "data", "bad_net.csv")
    with open(out, "w") as f:
        f.write("link_mbps,prove_wall_s,bytes_sent_party0\n")
        for r, t, sent in rows:
            f.write(f"{r},{t},{sent}\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
