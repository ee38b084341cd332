"""__graft_entry__.dryrun_multichip must survive the PRODUCTION environment.

The driver invokes dryrun_multichip with the container's axon env intact
(JAX_PLATFORMS=axon, PALLAS_AXON_POOL_IPS set, the axon sitecustomize on
PYTHONPATH). Round 3 failed because the entry point initialized the axon
backend in-process and hung when the relay was slow. The entry point now
re-execs into a scrubbed pure-CPU child before any jax import; this test
pins that contract by simulating the WORST case — axon vars pointing at a
black-hole address — and requiring completion within a hard deadline.
"""

import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.smoke
def test_dryrun_multichip_completes_under_axon_env(tmp_path):
    env = dict(os.environ)
    # Simulate the production axon env. 203.0.113.1 is TEST-NET-3
    # (RFC 5737): guaranteed-unroutable, so any process that dials the
    # "relay" blocks — exactly the round-3 failure mode.
    env['JAX_PLATFORMS'] = 'axon'
    env['PALLAS_AXON_POOL_IPS'] = '203.0.113.1'
    env.pop('RCFD_DRYRUN_CHILD', None)
    # keep any real sitecustomize path the host has; add a fake axon dir
    # too so the PYTHONPATH scrub is exercised even on hosts without one
    fake_axon = tmp_path / 'fake_axon_site'
    fake_axon.mkdir()
    (fake_axon / 'sitecustomize.py').write_text(
        'import os\n'
        "if os.environ.get('PALLAS_AXON_POOL_IPS'):\n"
        "    import socket\n"
        "    s = socket.socket(); s.settimeout(600)\n"
        "    try:\n"
        "        s.connect((os.environ['PALLAS_AXON_POOL_IPS'], 9)) \n"
        "    except OSError:\n"
        "        pass\n")
    env['PYTHONPATH'] = os.pathsep.join(
        [str(fake_axon), env.get('PYTHONPATH', '')])
    env['RCFD_DRYRUN_BUDGET'] = '540'
    # 4 devices keeps the test fast while still exercising DP + the 2x2
    # (data x spatial) GSPMD branch
    t0 = time.monotonic()
    result = subprocess.run(
        [sys.executable, '-c',
         'import __graft_entry__ as g; g.dryrun_multichip(4)'],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=560)
    elapsed = time.monotonic() - t0
    assert result.returncode == 0, result.stdout[-4000:]
    assert 'ALL CHECKS PASSED' in result.stdout, result.stdout[-4000:]
    # the scrubbed child must never print the axon experimental-platform
    # warning (it would mean the axon plugin was registered after all)
    assert "Platform 'axon'" not in result.stdout
    assert elapsed < 550, f'dryrun took {elapsed:.0f}s'
