"""The PLONKish prover: create_proof.

Analog of halo2_proofs plonk::create_proof (scroll-tech/halo2 v1.1; the
reference's hot path, invoked three times per chunk proof — SURVEY.md §3.3).
Every heavy step is device math:

- column commitments: iNTT + fixed-base windowed MSM;
- grand products: batched factor computation + Fermat inversion + an
  associative scan (log-depth prefix product — the TPU answer to halo2's
  sequential z-building loop);
- quotient: all constraints evaluated on the extended coset with batched
  field kernels, y-combined, divided by Z_H pointwise;
- multiopen: SHPLONK with quotients computed in evaluation form on the
  coset (no sequential synthetic division anywhere).

Host work is only transcript bytes and the lookup permutation ordering.
"""

from __future__ import annotations

import secrets
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from zkevm_tpu.ec import group
from zkevm_tpu.ec.group import G1
from zkevm_tpu.ff import limbs as ff
from zkevm_tpu.ff.goldens import FR_MOD
from zkevm_tpu.ff.limbs import fr_spec
from zkevm_tpu.kzg.params import ParamsKZG
from zkevm_tpu.plonk import shplonk
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import ConstraintSystem
from zkevm_tpu.plonk.expr import EvalContext
from zkevm_tpu.plonk.keygen import ProvingKey
from zkevm_tpu.plonk.protocol import build_protocol
from zkevm_tpu.poly import ntt as nttmod
from zkevm_tpu.transcript import KeccakTranscript

FR = fr_spec()

_DEBUG: dict = {}  # populated by create_proof for test introspection


@dataclass
class Proof:
    advice_commitments: list  # affine pairs, cs.advice_columns order
    lookup_permuted: list  # (a_comm, s_comm) per lookup
    perm_z_commitments: list
    lookup_z_commitments: list
    random_commitment: tuple
    h_commitments: list
    evals: list  # ints, protocol query order (+ random poly eval last)
    shplonk_h: tuple
    shplonk_w: tuple


def _commit(params: ParamsKZG, coeff) -> tuple:
    return group.to_affine_ints(params.commit(coeff))[0]


def _powers_table(x: int, n: int):
    """[1, x, x^2, ...] in Montgomery form — a device prefix product
    (log-depth associative scan), not a host loop."""
    xm = jnp.broadcast_to(jnp.asarray(FR.encode(x)), (n, ff.L))
    return prefix_product(xm)


def eval_polys_at(coeff_stack: jnp.ndarray, x: int) -> list[int]:
    """(m, n, 16) coefficient stack -> [poly_i(x)] as ints."""
    m, n = coeff_stack.shape[0], coeff_stack.shape[1]
    pows = _powers_table(x, n)
    terms = ff.mont_mul(FR, coeff_stack, pows)
    while n > 1:
        half = n // 2
        terms = ff.add(FR, terms[:, :half], terms[:, half : 2 * half])
        n = half
    return [FR.decode(np.asarray(terms[i, 0])) for i in range(m)]


@jax.jit
def prefix_product(factors: jnp.ndarray) -> jnp.ndarray:
    """(n, 16) Montgomery factors -> exclusive prefix products (z[0] = 1)."""
    ps = jax.lax.associative_scan(lambda a, b: ff.mont_mul(FR, a, b), factors, axis=0)
    one = jnp.asarray(FR.encode(1))[None]
    return jnp.concatenate([one, ps[:-1]], axis=0)


_FR_LIMBS = None


def _fr_limbs() -> np.ndarray:
    global _FR_LIMBS
    if _FR_LIMBS is None:
        _FR_LIMBS = np.asarray(ff.limbs_from_int(FR_MOD), np.uint32)
    return _FR_LIMBS


class _BlindSampler:
    """Uniform-in-Fr blinding source, vectorized. seed=None (the
    public-API default) draws from the OS CSPRNG; an explicit int seed
    gives a deterministic stream for tests/reproduction only — never
    default to a constant (zero-knowledge requires unpredictable,
    full-field blinds).

    rows(count) returns (count, 16) uint32 limb arrays uniform in
    [0, FR_MOD) by masked rejection sampling (254-bit candidates, ~76%
    acceptance) — these are written directly as polynomial-storage
    (Montgomery-domain) values: a uniform representation IS a uniform
    field element, no conversion needed for blinding rows.
    """

    def __init__(self, seed):
        self._rng = None if seed is None else np.random.default_rng(seed)

    def _bytes(self, count: int) -> np.ndarray:
        if self._rng is None:
            raw = secrets.token_bytes(count)
        else:
            raw = self._rng.bytes(count)
        return np.frombuffer(raw, dtype=np.uint8)

    def rows(self, count: int) -> np.ndarray:
        if count == 0:
            return np.zeros((0, ff.L), np.uint32)
        cand = (
            self._bytes(count * 32)
            .view("<u2")
            .reshape(count, ff.L)
            .astype(np.uint32)
        )
        cand[:, 15] &= 0x3FFF  # < 2^254
        p = _fr_limbs()
        lt = np.zeros(count, bool)
        gt = np.zeros(count, bool)
        for i in range(ff.L - 1, -1, -1):
            li, pi = cand[:, i], p[i]
            lt |= ~gt & (li < pi)
            gt |= ~lt & (li > pi)
        bad = ~lt
        if bad.any():
            cand[bad] = self.rows(int(bad.sum()))
        return cand

    def __call__(self) -> int:
        limbs16 = self.rows(1)[0]
        v = 0
        for i in range(ff.L - 1, -1, -1):
            v = (v << 16) | int(limbs16[i])
        return v


def _blind_sampler(seed):
    return _BlindSampler(seed)


def _lex_order(rows: np.ndarray) -> np.ndarray:
    """Stable order sorting (m, 16) limb rows lexicographically (limb 15
    most significant). ANY total order works for the lookup permutation —
    equal field values just have to be adjacent — so rows sort by their
    Montgomery representation with no decode."""
    return np.lexsort(rows.T)


def _permute_lookup(a_mont: np.ndarray, s_mont: np.ndarray, active: int, n: int, blinds):
    """halo2 lookup::permute_expression_pair, vectorized host NumPy:
    returns (a', s') as (n, 16) uint32 Montgomery arrays (tails random).

    a' = sorted inputs; s'[i] = a'[i] wherever a' starts a new value run
    (consuming one copy from the table multiset), remaining table entries
    fill the other rows. No Python-int round trips: sorting, run
    detection, first-occurrence matching and multiset fill are all
    vectorized over the limb arrays.
    """
    a_act = np.asarray(a_mont)[:active]
    s_act = np.asarray(s_mont)[:active]
    a_sorted = a_act[_lex_order(a_act)]
    s_sorted = s_act[_lex_order(s_act)]

    heads = np.ones(active, bool)
    heads[1:] = np.any(a_sorted[1:] != a_sorted[:-1], axis=1)

    # dense per-row rank ids shared by both arrays; columns reversed so
    # np.unique's first-column-major row order agrees with _lex_order's
    # limb-15-most-significant order (ranks must ascend along s_sorted)
    cat = np.concatenate([a_sorted, s_sorted])[:, ::-1]
    _, inv = np.unique(cat, axis=0, return_inverse=True)
    a_rank, s_rank = inv[:active], inv[active:]

    distinct = a_rank[heads]
    first = np.searchsorted(s_rank, distinct, side="left")
    ok = (first < active) & (s_rank[np.minimum(first, active - 1)] == distinct)
    if not ok.all():
        missing = a_sorted[heads][~ok][0]
        v = FR.decode(missing)
        raise ValueError(f"lookup failure: input {v} not in table")

    consumed = np.zeros(active, bool)
    consumed[first] = True
    s_prime = np.empty_like(a_sorted)
    s_prime[heads] = a_sorted[heads]
    s_prime[~heads] = s_sorted[~consumed]

    tail_a = blinds.rows(n - active)
    tail_s = blinds.rows(n - active)
    return (
        np.concatenate([a_sorted, tail_a]),
        np.concatenate([s_prime, tail_s]),
    )


def create_proof(
    params: ParamsKZG,
    pk: ProvingKey,
    instances: list[list[int]],
    witness_phases,
    *,
    seed: int | None = None,
    transcript: KeccakTranscript | None = None,
) -> Proof:
    """witness_phases: callable (phase, challenges: dict[Challenge,int]) ->
    {advice Column: (n,16) uint32 Montgomery array} covering that phase's
    columns. For single-phase circuits, a plain dict {Column: array} or an
    Assignment also works.
    """
    cs = pk.vk.cs
    domain = pk.vk.domain
    k, n = domain.k, domain.n
    usable = cs.usable_rows(n)
    u_row = usable - 1
    draw = _blind_sampler(seed)
    tr = transcript or KeccakTranscript()

    if isinstance(witness_phases, Assignment):
        adv = {c: witness_phases.cols[c] for c in cs.advice_columns}
        witness_phases = lambda phase, ch: (
            {c: a for c, a in adv.items() if c.phase == phase}
        )
    elif isinstance(witness_phases, dict):
        adv = dict(witness_phases)
        witness_phases = lambda phase, ch: (
            {c: a for c, a in adv.items() if c.phase == phase}
        )

    # -- 0. bind statement ----------------------------------------------
    tr.common_scalar(k)
    for inst in instances:
        for v in inst:
            tr.common_scalar(v)
    for c in pk.vk.fixed_commitments + pk.vk.sigma_commitments:
        tr.common_point(c)

    # -- 1. advice commitments per phase, interleaved with challenges ----
    advice_lagrange: dict = {}
    advice_coeff: dict = {}
    advice_comm: dict = {}
    challenge_vals: dict = {}

    def blind(arr):
        out = np.array(arr, dtype=np.uint32)
        out[usable:] = draw.rows(n - usable)
        return out

    for phase in range(cs.num_phases):
        ch_by_obj = {c: challenge_vals.get(c.index) for c in cs.challenges}
        new_cols = witness_phases(phase, ch_by_obj)
        for c in cs.advice_columns:
            if c.phase != phase:
                continue
            arr = blind(new_cols[c])
            advice_lagrange[c] = arr
            coeff = nttmod.intt(jnp.asarray(arr), k)
            advice_coeff[c] = coeff
            advice_comm[c] = _commit(params, coeff)
            tr.common_point(advice_comm[c])
        for ch in cs.challenges:
            if ch.phase == phase + 1:
                challenge_vals[ch.index] = tr.challenge()

    challenges_int = [challenge_vals.get(i, 0) for i in range(len(cs.challenges))]
    ch_mont = [jnp.asarray(FR.encode(v)) for v in challenges_int]

    # -- 2. theta; lookup permuted columns -------------------------------
    theta = tr.challenge()
    base_cols = {}
    base_cols.update({c: jnp.asarray(a) for c, a in pk.fixed_lagrange.items()})
    base_cols.update({c: jnp.asarray(a) for c, a in advice_lagrange.items()})
    for c, inst in zip(cs.instance_columns, instances):
        arr = np.zeros((n, ff.L), np.uint32)
        for i, v in enumerate(inst):
            arr[i] = FR.encode(v)
        base_cols[c] = jnp.asarray(arr)
    base_ctx = EvalContext(dict(base_cols), ch_mont)

    def compress_vals(exprs):
        acc = None
        th = jnp.asarray(FR.encode(theta))
        for e in exprs:
            v = e.evaluate(base_ctx)
            v = jnp.broadcast_to(v, (n, ff.L))
            acc = v if acc is None else ff.add(FR, ff.mont_mul(FR, acc, th), v)
        return acc

    lookup_data = []
    for lk in cs.lookups:
        a_vals = compress_vals(lk.inputs)
        s_vals = compress_vals(lk.tables)
        ap, sp = _permute_lookup(
            np.asarray(a_vals), np.asarray(s_vals), u_row, n, draw
        )
        lookup_data.append(
            {"a": a_vals, "s": s_vals, "ap": jnp.asarray(ap), "sp": jnp.asarray(sp)}
        )

    lookup_permuted = []
    for ld in lookup_data:
        ld["ap_coeff"] = nttmod.intt(ld["ap"], k)
        ld["sp_coeff"] = nttmod.intt(ld["sp"], k)
        ca = _commit(params, ld["ap_coeff"])
        cb = _commit(params, ld["sp_coeff"])
        lookup_permuted.append((ca, cb))
        tr.common_point(ca)
        tr.common_point(cb)

    # -- 3. beta, gamma; grand products ----------------------------------
    beta = tr.challenge()
    gamma = tr.challenge()
    beta_m = jnp.asarray(FR.encode(beta))
    gamma_m = jnp.asarray(FR.encode(gamma))
    one_m = jnp.asarray(FR.encode(1))
    active_mask = np.zeros((n, 1), dtype=bool)
    active_mask[:u_row] = True
    active_mask = jnp.asarray(active_mask)

    protocol = build_protocol(cs, n, theta, beta, gamma)
    chunk_len = cs.permutation_chunk_len()

    perm_z_arrays = []
    last_tail = None
    for ci, cols in enumerate(protocol.perm_chunks):
        num = None
        den = None
        for j, col in enumerate(cols):
            jg = ci * chunk_len + j
            val = base_cols[col]
            sig = jnp.asarray(pk.sigma_lagrange[jg])
            idb = jnp.asarray(pk.identity_base[jg])
            # constraint: z(wX) * prod(col + b*sigma + g) = z(X) * prod(col + b*dX + g)
            # so z accumulates identity-terms / sigma-terms
            f_num = ff.add(FR, ff.add(FR, val, ff.mont_mul(FR, beta_m, idb)), gamma_m)
            f_den = ff.add(FR, ff.add(FR, val, ff.mont_mul(FR, beta_m, sig)), gamma_m)
            num = f_num if num is None else ff.mont_mul(FR, num, f_num)
            den = f_den if den is None else ff.mont_mul(FR, den, f_den)
        factors = ff.mont_mul(FR, num, ff.inv(FR, den))
        factors = jnp.where(active_mask, factors, one_m[None])
        z = prefix_product(factors)
        # chain: multiply by previous chunk's final value
        if ci > 0:
            z = ff.mont_mul(FR, z, last_tail)
        last_tail = z[u_row]
        z = np.array(z)
        z[usable:] = draw.rows(n - usable)
        perm_z_arrays.append(z)

    lookup_z_arrays = []
    for ld in lookup_data:
        num = ff.mont_mul(FR, ff.add(FR, ld["a"], beta_m), ff.add(FR, ld["s"], gamma_m))
        den = ff.mont_mul(FR, ff.add(FR, ld["ap"], beta_m), ff.add(FR, ld["sp"], gamma_m))
        factors = ff.mont_mul(FR, num, ff.inv(FR, den))
        factors = jnp.where(active_mask, factors, one_m[None])
        z = np.array(prefix_product(factors))
        z[usable:] = draw.rows(n - usable)
        lookup_z_arrays.append(z)

    perm_z_comm, perm_z_coeff = [], []
    for z in perm_z_arrays:
        coeff = nttmod.intt(jnp.asarray(z), k)
        perm_z_coeff.append(coeff)
        c = _commit(params, coeff)
        perm_z_comm.append(c)
        tr.common_point(c)
    lookup_z_comm, lookup_z_coeff = [], []
    for z in lookup_z_arrays:
        coeff = nttmod.intt(jnp.asarray(z), k)
        lookup_z_coeff.append(coeff)
        c = _commit(params, coeff)
        lookup_z_comm.append(c)
        tr.common_point(c)

    # -- 4. vanishing: random poly, y, quotient --------------------------
    random_coeff = jnp.asarray(draw.rows(n))
    random_comm = _commit(params, random_coeff)
    tr.common_point(random_comm)
    y = tr.challenge()

    # -- part-chunked quotient evaluation (halo2 evaluate_h shape) -------
    # Evaluating every referenced column over the FULL extended coset at
    # once materializes (advice + fixed + 3-per-lookup aux) extended
    # arrays — thousands of columns x extended_n, past the chip's HBM for
    # lookup-heavy circuits. The extended coset splits into
    # P = extended_n/n INTERLEAVED parts (part j = points g*W^j*<w_n>,
    # full index i = m*P + j): a unit Expr rotation shifts the full index
    # by P, which stays inside the part as a unit row shift — so every
    # constraint evaluates per part on n-sized arrays with rot_scale=1.
    from zkevm_tpu.plonk.protocol import aux

    P = domain.extended_n // n
    coeff_map = {}
    for c, coeff in pk.fixed_coeff.items():
        coeff_map[c] = coeff
    coeff_map.update(advice_coeff)
    for c, inst in zip(cs.instance_columns, instances):
        arr = np.zeros((n, ff.L), np.uint32)
        for i, v in enumerate(inst):
            arr[i] = FR.encode(v)
        coeff_map[c] = nttmod.intt(jnp.asarray(arr), k)
    for i, sig_col in enumerate(protocol.sigma_cols):
        coeff_map[sig_col] = pk.sigma_coeff[i]
    l0c, llastc, lblindc = protocol.virtual_cols
    coeff_map[l0c] = pk.l0_coeff
    coeff_map[llastc] = pk.llast_coeff
    if pk.lblind_coeff is not None:
        coeff_map[lblindc] = pk.lblind_coeff
    else:  # older proving keys carry only the extended form
        coeff_map[lblindc] = domain.extended_to_coeff(pk.lblind_ext)[:n]
    aux_coeffs = {}
    for i, ld in enumerate(lookup_data):
        aux_coeffs[aux(f"lookup_a_perm{i}")] = ld["ap_coeff"]
        aux_coeffs[aux(f"lookup_s_perm{i}")] = ld["sp_coeff"]
        aux_coeffs[aux(f"lookup_z{i}")] = lookup_z_coeff[i]
    for ci in range(len(protocol.perm_chunks)):
        aux_coeffs[aux(f"perm_z{ci}")] = perm_z_coeff[ci]
    coeff_map.update(aux_coeffs)

    cols_order = list(coeff_map)
    big = jnp.stack([jnp.asarray(coeff_map[c]) for c in cols_order])
    wn_pows = jnp.asarray(nttmod._power_table(domain.omega, n))
    y_m = jnp.asarray(FR.encode(y))

    def _h_part(part_vals, domain_x):
        cols_j = {c: part_vals[idx] for idx, c in enumerate(cols_order)}
        ctx = EvalContext(cols_j, ch_mont, rot_scale=1, n=n)
        ctx.set_domain_x(domain_x)
        hj = jnp.zeros((n, ff.L), jnp.uint32)
        for con, width in protocol.constraints:
            v = con.evaluate(ctx)
            if width:
                # vector constraint: (n, W, 16); fold lanes in order —
                # equivalent to W sequential scalar folds (verifier view)
                ypows = np.stack(
                    [FR.encode(pow(y, width - 1 - z, FR_MOD))
                     for z in range(width)]
                )
                fold = ff.mont_mul(FR, v, jnp.asarray(ypows)[None])
                m = 1
                while m < width:
                    m *= 2
                if m != width:  # pad lanes with zeros (additive identity)
                    pad = jnp.zeros((fold.shape[0], m - width, ff.L),
                                    jnp.uint32)
                    fold = jnp.concatenate([fold, pad], axis=1)
                while m > 1:  # tree-sum the lane axis (log2 W adds)
                    m //= 2
                    fold = ff.add(FR, fold[:, :m], fold[:, m:])
                yw = jnp.asarray(FR.encode(pow(y, width, FR_MOD)))
                hj = ff.add(FR, ff.mont_mul(FR, hj, yw), fold[:, 0])
            else:
                v = jnp.broadcast_to(v, (n, ff.L))
                hj = ff.add(FR, ff.mont_mul(FR, hj, y_m), v)
        return hj

    h_part_fn = jax.jit(_h_part)
    h_parts = []
    for j in range(P):
        shift = domain.g_coset * pow(domain.extended_omega, j, FR_MOD) \
            % FR_MOD
        scale = jnp.asarray(nttmod._power_table(shift, n))
        part_vals = nttmod.ntt(ff.mont_mul(FR, big, scale[None]), k)
        domain_x = ff.mont_mul(FR, wn_pows, jnp.asarray(FR.encode(shift)))
        h_parts.append(h_part_fn(part_vals, domain_x))
    # interleave: full[m*P + j] = parts[j][m]
    h_ext = jnp.stack(h_parts, axis=1).reshape(domain.extended_n, ff.L)
    h_ext = domain.divide_by_vanishing_poly(h_ext)
    h_coeff_full = domain.extended_to_coeff(h_ext)
    # deg(h) <= d(n-1) - n < (d-1)n for gate degree d, so exactly d-1
    # n-chunks carry coefficients (halo2's quotient_poly_degree = cs
    # degree - 1); committing the zero tail chunks would put identity
    # points in the proof, which the in-circuit verifier cannot witness.
    num_pieces = max(cs.gate_degree() - 1, 1)
    assert num_pieces <= domain.extended_n // n
    tail = np.asarray(h_coeff_full[num_pieces * n :])
    assert not tail.any(), "quotient tail pieces must be zero"
    h_pieces = [h_coeff_full[i * n : (i + 1) * n] for i in range(num_pieces)]
    h_comms = []
    for hp in h_pieces:
        c = _commit(params, hp)
        h_comms.append(c)
        tr.common_point(c)

    x = tr.challenge()

    _DEBUG.clear()
    _DEBUG.update(
        ext_ctx=None, protocol=protocol, x=x, y=y, domain=domain,
        challenges=challenges_int, theta=theta, beta=beta, gamma=gamma,
    )

    # -- 5. evaluations ---------------------------------------------------
    def coeff_of(col):
        if col.kind == "fixed":
            return pk.fixed_coeff[col]
        if col.kind == "advice":
            return advice_coeff[col]
        if col.kind == "aux":
            if str(col.index).startswith("sigma"):
                return pk.sigma_coeff[int(str(col.index)[5:])]
            return aux_coeffs[col]
        raise KeyError(col)

    omega = domain.omega
    by_rot: dict[int, list] = {}
    for col, rot in protocol.queries:
        by_rot.setdefault(rot, []).append(col)
    evals_map = {}
    for rot, cols_r in by_rot.items():
        pt = pow(omega, rot % n, FR_MOD) * x % FR_MOD
        stack = jnp.stack([coeff_of(c) for c in cols_r])
        vals = eval_polys_at(stack, pt)
        for c, v in zip(cols_r, vals):
            evals_map[(c, rot)] = v
    random_eval = eval_polys_at(random_coeff[None], x)[0]

    evals_list = [evals_map[q] for q in protocol.queries] + [random_eval]
    for v in evals_list:
        tr.common_scalar(v)

    # -- 6. SHPLONK multiopen ---------------------------------------------
    # collapsed h polynomial: sum x^{n i} h_i
    xn = pow(x, n, FR_MOD)
    h_collapsed = None
    w = 1
    weights = []
    for i in range(num_pieces):
        weights.append(w)
        w = w * xn % FR_MOD
    h_stack = jnp.stack(h_pieces)
    w_m = jnp.asarray(np.stack([FR.encode(v) for v in weights]))[:, None, :]
    h_collapsed = ff.mont_mul(FR, h_stack, w_m)
    hc = h_collapsed[0]
    for i in range(1, num_pieces):
        hc = ff.add(FR, hc, h_collapsed[i])

    # actual collapsed-h eval; the verifier recomputes the EXPECTED value
    # from the gate identity — if they differ the shplonk check fails.
    h_eval = eval_polys_at(hc[None], x)[0]

    sh_queries = []  # (label, coeff_array, point, eval)
    for (col, rot) in protocol.queries:
        pt = pow(omega, rot % n, FR_MOD) * x % FR_MOD
        sh_queries.append(
            (f"{col.kind}:{col.index}", coeff_of(col), pt, evals_map[(col, rot)])
        )
    sh_queries.append(("random", random_coeff, x, random_eval))
    sh_queries.append(("h_collapsed", hc, x, h_eval))

    sh_h, sh_w = shplonk.open_many(params, domain, sh_queries, tr)

    return Proof(
        advice_commitments=[advice_comm[c] for c in cs.advice_columns],
        lookup_permuted=lookup_permuted,
        perm_z_commitments=perm_z_comm,
        lookup_z_commitments=lookup_z_comm,
        random_commitment=random_comm,
        h_commitments=h_comms,
        evals=evals_list,
        shplonk_h=sh_h,
        shplonk_w=sh_w,
    )
