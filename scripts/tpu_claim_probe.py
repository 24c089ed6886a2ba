"""Claim-probe the tunneled TPU with a CLIENT-SIDE timeout.

Launch with PALLAS_AXON_POOL_IPS unset/empty so the sitecustomize skips its
auto-register (whose claim poll never times out and can only be stopped by
killing the process — and killed-mid-claim clients are the suspected cause
of wedged grants on this relay).  Registers the axon backend exactly like
the sitecustomize does, plus ``claim_timeout_s`` so an unavailable chip
makes ``jax.devices()`` raise instead of hanging forever.

Exit 0: chip claimed and a matmul ran.  Exit 1: claim timed out / failed.
"""

import os
import sys
import uuid

TIMEOUT_S = int(os.environ.get("CLAIM_PROBE_TIMEOUT_S", 300))

os.environ["PALLAS_AXON_POOL_IPS"] = "127.0.0.1"
os.environ["AXON_POOL_SVC_OVERRIDE"] = "127.0.0.1"
os.environ["AXON_LOOPBACK_RELAY"] = "1"
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
os.environ["JAX_PLATFORMS"] = "axon"

from axon.register import register  # noqa: E402

try:
    register(
        None,
        f"{os.environ.get('PALLAS_AXON_TPU_GEN', 'v5e')}:1x1x1",
        so_path="/opt/axon/libaxon_pjrt.so",
        session_id=str(uuid.uuid4()),
        remote_compile=os.environ.get("PALLAS_AXON_REMOTE_COMPILE", "1") == "1",
        claim_timeout_s=TIMEOUT_S,
    )
    import time

    import jax

    t0 = time.time()
    d = jax.devices()
    print(f"devices {d} after {time.time() - t0:.1f} s", flush=True)
    import jax.numpy as jnp

    x = jnp.ones((256, 256))
    print("matmul ok", float((x @ x)[0, 0]), flush=True)
except Exception as e:
    print(f"claim probe failed: {type(e).__name__}: {e}", flush=True)
    sys.exit(1)
sys.exit(0)
