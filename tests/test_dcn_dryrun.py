"""Multi-host (DCN) path execution coverage.

Runs scripts/dcn_dryrun.py: a real two-process jax.distributed CPU cluster
(2 local devices each, 4 global) executing one data-parallel train step
with the batch split across processes; the parent verifies the loss is
identical across processes and matches a single-process 4-device run.
This is the only executable coverage `parallel.mesh.init_distributed`
can get on a single-chip rig.
"""

import json
import os
import subprocess
import sys


def test_two_process_data_parallel_step_matches_single_process():
    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "dcn_dryrun.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)            # parent sets its own device count
    out = subprocess.run([sys.executable, os.path.abspath(script)],
                         env=env, capture_output=True, text=True,
                         timeout=600)
    assert out.returncode == 0, out.stderr[-4000:]
    rec = json.loads([l for l in out.stdout.splitlines()
                      if l.startswith("{\"ok\"")][-1])
    assert rec["ok"] and rec["rel_err"] < 1e-5, rec
