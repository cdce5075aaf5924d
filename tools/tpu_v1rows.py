"""v1 kernel ray-block-size sweep on the headline fwd+bwd bench."""
import os, subprocess, sys
for br in ("8", "16", "32"):
    env = dict(os.environ, RPT_V1_BLOCK_ROWS=br)
    print(f"=== V1_BLOCK_ROWS={br}", flush=True)
    subprocess.run([sys.executable, "bench.py"], env=env, timeout=1200)
