"""Simulated multi-host (DCN) data-parallel input path.

Spawns 2 local processes x 4 CPU devices each via the JAX distributed
runtime (Gloo CPU collectives) and runs tests/multihost_worker.py in both:
the global mesh spans processes, each host feeds only its own batch shard
(``make_array_from_process_local_data``), and the data-parallel gradient
all-reduce crosses the process boundary.  This upgrades the multi-host
branch of the train loop (train_loop.py:376-383, mesh.py:54-56) from
"code-complete" to "executed in simulation".

Reference parity note: the reference has NO distributed backend
(SURVEY.md §2.10); multi-host DP is a capability this framework adds.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]
WORKER = ROOT / 'tests' / 'multihost_worker.py'

# failure signatures that mean "this jaxlib cannot do multi-process CPU
# collectives here", not "our code is wrong"
_ENV_SKIP = ('gloo', 'collectives', 'DISTRIBUTED', 'coordinator',
             'UNAVAILABLE', 'DEADLINE_EXCEEDED')


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def test_two_process_dcn_input_path():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS')}
    procs = [subprocess.Popen(
        [sys.executable, str(WORKER), str(port), str(i), '2'],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=str(ROOT), env=env) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append((p.returncode, out))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip('multi-process CPU distributed runtime timed out '
                    '(environment limitation)')

    for rc, out in outs:
        if rc != 0:
            if any(sig in out for sig in _ENV_SKIP) and \
                    'MULTIHOST_OK' not in out:
                pytest.skip(f'distributed CPU backend unavailable: '
                            f'{out[-400:]}')
            raise AssertionError(f'worker failed rc={rc}:\n{out[-2000:]}')

    grads = [line for rc, out in outs for line in out.splitlines()
             if line.startswith('MULTIHOST_OK')]
    assert len(grads) == 2, outs
    # both processes computed the identical globally-reduced gradient
    assert grads[0] == grads[1], grads
