"""Steady-state rANS chunk timing (decode compile excluded)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scp_tpu.codec import rans
from scp_tpu.codec.ehem_codec import logits_to_cdf
from scp_tpu.utils import enable_compilation_cache

enable_compilation_cache()

rng = np.random.default_rng(0)
N = 8 * rans.CHUNK  # 131072 symbols ~ one big-level parity group
logits = rng.normal(0, 3, (rans.CHUNK, 255)).astype(np.float32)
rows1 = logits_to_cdf(jnp.asarray(logits))
rows = jnp.tile(rows1, (8, 1))
syms = jax.device_put(rng.integers(0, 255, N).astype(np.int32))
sf = rans.gather_start_freq(rows, syms)

# encode: chain all chunks, fetch once
enc = rans.RansEncoder()
enc.append_group(sf, N)
t0 = time.time()
payload = enc.finish()
t_first = time.time() - t0
enc2 = rans.RansEncoder()
enc2.append_group(sf, N)
t0 = time.time()
payload2 = enc2.finish()
t_enc = time.time() - t0
assert payload == payload2
print(f"rans encode {N} syms: first {t_first:.2f}s steady {t_enc:.3f}s "
      f"({N/t_enc/1e6:.1f} Msym/s)", flush=True)

rows16 = rows.astype(jnp.uint16)
for it in range(3):
    dec = rans.RansDecoder(payload)
    t0 = time.time()
    out = dec.decode_group(rows16, N)
    got = np.asarray(out)
    dt = time.time() - t0
    assert (got[:N] == np.asarray(syms)).all()
    print(f"rans decode iter{it}: {dt:.3f}s ({N/dt/1e6:.2f} Msym/s)", flush=True)
