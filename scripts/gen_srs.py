"""Generate and cache a test SRS file on the CPU (halo2 file layout).

Usage: python scripts/gen_srs.py [k ...]   (default: 14)

The tunneled TPU pays ~1 min of latency per compile; generating the SRS
there wedges easily. This runs `unsafe_setup` on XLA:CPU (cached
compiles) and writes the halo2-layout file `prove_super.py` &co load
(reference: prover/src/utils.rs load_params + download_setup.sh, with
the test-tau caveat documented in kzg/srs.py)."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_zkevm_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from zkevm_tpu.kzg.params import ParamsKZG
from zkevm_tpu.kzg.srs import params_path, write_params_file

TAU = 777


def main():
    ks = [int(a) for a in sys.argv[1:]] or [14]
    out_dir = os.environ.get("ZKEVM_TPU_SRS_DIR", "/root/.cache/zkevm_srs")
    os.makedirs(out_dir, exist_ok=True)
    for k in ks:
        path = params_path(out_dir, k)
        if os.path.exists(path):
            print(f"[gen_srs] {path} exists", flush=True)
            continue
        import time
        t0 = time.time()
        params = ParamsKZG.unsafe_setup(k, tau=TAU)
        t1 = time.time()
        write_params_file(params, path, tau=TAU)
        print(f"[gen_srs] k={k}: setup={t1 - t0:.1f}s "
              f"write={time.time() - t1:.1f}s -> {path}", flush=True)


if __name__ == "__main__":
    main()
