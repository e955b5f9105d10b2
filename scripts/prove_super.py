"""Real KZG/SHPLONK proof of the SuperCircuit on the available device.

Reference counterpart: prover/src/zkevm/prover.rs gen_chunk_proof's inner
snark (the "~10 min chunk" at prover.rs:54) — this is the framework's
end-to-end prove+verify of a multi-tx block with the PI-hash instance,
timed per phase (keygen / witness / prove / verify).

Run on the TPU chip (default platform) or CPU:
    python scripts/prove_super.py            # device = whatever jax picks
    JAX_PLATFORMS=cpu python scripts/prove_super.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_zkevm_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from zkevm_tpu.circuits import super_circuit as sup
from zkevm_tpu.kzg.params import ParamsKZG
from zkevm_tpu.plonk import ConstraintSystem
from zkevm_tpu.plonk.keygen import keygen
from zkevm_tpu.plonk.prover import create_proof
from zkevm_tpu.plonk.verifier import verify_proof
from zkevm_tpu.testctx import TestContext
from zkevm_tpu.witness.block import CircuitsParams, block_convert

CODE = bytes([
    0x60, 5, 0x60, 7, 0x01, 0x60, 0, 0x52,
    0x60, 0, 0x51, 0x60, 1, 0x55, 0x5B, 0x00,
])
PARAMS = CircuitsParams(max_txs=2, max_calldata=16, max_rlp=128)


def main():
    platform = jax.devices()[0].platform
    print(f"[prove_super] platform={platform}", flush=True)

    ctx = TestContext.new(
        accounts=[
            lambda a: a.balance(10**19),
            lambda a: a.balance(10**18),
            lambda a: a.code(CODE),
        ],
        txs=[
            lambda t: t.from_(0).to(1).value(10**15),
            lambda t: t.from_(1).to(2).value(3),
        ],
    )
    block = block_convert(ctx, PARAMS)

    cs = ConstraintSystem()
    cfg = sup.configure(cs, PARAMS, limb_bits=10)
    k = sup.choose_k(cfg, block)
    n = 1 << k
    print(f"[prove_super] k={k} gates={len(cs.gates)} lookups={len(cs.lookups)} "
          f"advice={len(cs.advice_columns)} fixed={len(cs.fixed_columns)}",
          flush=True)

    t0 = time.time()
    # load a pre-generated test SRS when present (scripts/gen_srs.py
    # writes it on CPU — the tunneled chip pays ~1 min of latency per
    # compile, so the setup scalar-mul graph is best avoided there)
    from zkevm_tpu.kzg.srs import load_params_file, params_path
    srs_dir = os.environ.get("ZKEVM_TPU_SRS_DIR", "/root/.cache/zkevm_srs")
    srs_file = params_path(srs_dir, k)
    if os.path.exists(srs_file):
        params = load_params_file(srs_file, k)
        print(f"[prove_super] srs loaded from {srs_file}", flush=True)
    else:
        params = ParamsKZG.unsafe_setup(k, tau=777)
    if jax.device_count() > 1:
        # shard every create_proof commitment over the visible chips
        # (parallel.mesh.MeshMSM: point-sharded, all_gather reduce)
        params.use_mesh()
        print(f"[prove_super] commit path sharded over "
              f"{jax.device_count()} devices", flush=True)
    t_srs = time.time() - t0

    t0 = time.time()
    wit = sup.assign(cs, cfg, n, block)
    t_wit = time.time() - t0

    t0 = time.time()
    pk = keygen(params, cs, wit.asg)
    t_key = time.time() - t0
    print(f"[prove_super] srs={t_srs:.1f}s witness={t_wit:.1f}s "
          f"keygen={t_key:.1f}s", flush=True)

    instances = wit.instance()
    t0 = time.time()
    proof = create_proof(params, pk, instances, wit.witness_phases())
    t_prove = time.time() - t0

    t0 = time.time()
    ok = verify_proof(params, pk.vk, instances, proof)
    t_verify = time.time() - t0
    assert ok, "proof rejected"

    print(f"[prove_super] PROVEN k={k} prove={t_prove:.1f}s "
          f"verify={t_verify:.1f}s platform={platform}", flush=True)


if __name__ == "__main__":
    main()
