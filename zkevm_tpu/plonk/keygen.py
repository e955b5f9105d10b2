"""Key generation: proving/verifying keys for the PLONKish runtime.

Analog of halo2_proofs `keygen_vk` / `keygen_pk` (reference: scroll-tech/
halo2 v1.1; invoked by the reference at e.g. prover/src/common/prover/
utils.rs and circuit-benchmarks/src/super_circuit.rs:104). Builds:
- commitments to fixed columns;
- the permutation argument's sigma polynomials from recorded copy
  constraints (cycle merge — same math as halo2 permutation/keygen.rs);
- precomputed Lagrange helpers l_0, l_last, l_blind.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from zkevm_tpu.ec.group import G1
from zkevm_tpu.ec import group
from zkevm_tpu.ff import limbs as ff
from zkevm_tpu.ff.goldens import FR_GENERATOR, FR_MOD, FR_TWO_ADICITY, fr_root_of_unity
from zkevm_tpu.ff.limbs import fr_spec
from zkevm_tpu.kzg.params import ParamsKZG
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import Column, ConstraintSystem
from zkevm_tpu.poly.domain import Domain
from zkevm_tpu.poly import ntt as nttmod

FR = fr_spec()

# delta: generator of the odd-order subgroup (t = (r-1)/2^S), so the cosets
# delta^j * H are pairwise disjoint — halo2curves Fr::DELTA equivalent.
DELTA = pow(FR_GENERATOR, 1 << FR_TWO_ADICITY, FR_MOD)


@dataclass
class VerifyingKey:
    cs: ConstraintSystem
    domain: Domain
    fixed_commitments: list  # affine int pairs
    sigma_commitments: list  # affine int pairs
    fixed_evals_cache: dict | None = None

    @property
    def n(self) -> int:
        return self.domain.n


@dataclass
class ProvingKey:
    vk: VerifyingKey
    fixed_lagrange: dict  # Column -> (n,16) np
    fixed_coeff: dict  # Column -> (n,16) jnp
    fixed_ext: dict  # Column -> (ext_n,16) jnp
    sigma_lagrange: list  # per perm column, (n,16) np
    sigma_coeff: list
    sigma_ext: list
    l0_ext: jnp.ndarray
    llast_ext: jnp.ndarray
    lblind_ext: jnp.ndarray
    l0_coeff: jnp.ndarray
    llast_coeff: jnp.ndarray
    lblind_coeff: jnp.ndarray = None
    identity_base: list = None  # per perm column j: (n,16) np of delta^j * omega^i


def build_sigmas(cs: ConstraintSystem, n: int) -> list[np.ndarray]:
    """Copy constraints -> sigma column arrays (standard-form ints encoded
    to Montgomery limbs). Cells not in any cycle map to themselves."""
    perm_cols = cs.permutation_columns
    col_idx = {c: j for j, c in enumerate(perm_cols)}
    # next-pointer cycle representation, as in halo2 keygen
    mapping = [np.arange(n, dtype=np.int64) + (j << 40) for j in range(len(perm_cols))]
    # flatten: cell id = (col_j << 40) | row
    nxt = {}

    def find_rep(cell, parent):
        root = cell
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(cell, cell) != cell:
            parent[cell], cell = root, parent[cell]
        return root

    parent: dict[int, int] = {}
    members: dict[int, list[int]] = {}
    for ca, ra, cb, rb in cs.copies:
        a = (col_idx[ca] << 40) | ra
        b = (col_idx[cb] << 40) | rb
        ra_, rb_ = find_rep(a, parent), find_rep(b, parent)
        if ra_ != rb_:
            parent[rb_] = ra_

    # collect classes
    for ca, ra, cb, rb in cs.copies:
        for cell in ((col_idx[ca] << 40) | ra, (col_idx[cb] << 40) | rb):
            rep = find_rep(cell, parent)
            members.setdefault(rep, [])
    for ca, ra, cb, rb in cs.copies:
        for cell in ((col_idx[ca] << 40) | ra, (col_idx[cb] << 40) | rb):
            rep = find_rep(cell, parent)
            lst = members[rep]
            if cell not in lst:
                lst.append(cell)

    # sigma = cyclic shift within each class
    sigma_cell = {}
    for cells in members.values():
        for i, cell in enumerate(cells):
            sigma_cell[cell] = cells[(i + 1) % len(cells)]

    omega = fr_root_of_unity((n - 1).bit_length())
    omega_pows = [1] * n
    for i in range(1, n):
        omega_pows[i] = omega_pows[i - 1] * omega % FR_MOD
    deltas = [pow(DELTA, j, FR_MOD) for j in range(len(perm_cols))]

    sigmas = []
    for j in range(len(perm_cols)):
        vals = np.empty((n, ff.L), dtype=np.uint32)
        for i in range(n):
            cell = (j << 40) | i
            tgt = sigma_cell.get(cell, cell)
            tj, ti = tgt >> 40, tgt & ((1 << 40) - 1)
            vals[i] = FR.encode(deltas[tj] * omega_pows[ti] % FR_MOD)
        sigmas.append(vals)
    return sigmas


def _lagrange_one_hot(domain: Domain, rows) -> np.ndarray:
    v = np.zeros((domain.n, ff.L), dtype=np.uint32)
    one = FR.encode(1)
    for r in rows:
        v[r] = one
    return v


def keygen(params: ParamsKZG, cs: ConstraintSystem, fixed_assignment: Assignment) -> ProvingKey:
    k = params.k
    domain = Domain.new(cs.gate_degree() + 1, k)
    n = domain.n
    assert fixed_assignment.n == n

    fixed_lagrange = {c: fixed_assignment.cols[c] for c in cs.fixed_columns}
    fixed_coeff, fixed_ext, fixed_comm = {}, {}, []
    for c in cs.fixed_columns:
        coeff = nttmod.intt(jnp.asarray(fixed_lagrange[c]), k)
        fixed_coeff[c] = coeff
        fixed_ext[c] = domain.coeff_to_extended(coeff)
        fixed_comm.append(group.to_affine_ints(params.commit(coeff))[0])

    sigma_lagrange = build_sigmas(cs, n)
    sigma_coeff, sigma_ext, sigma_comm = [], [], []
    for s in sigma_lagrange:
        coeff = nttmod.intt(jnp.asarray(s), k)
        sigma_coeff.append(coeff)
        sigma_ext.append(domain.coeff_to_extended(coeff))
        sigma_comm.append(group.to_affine_ints(params.commit(coeff))[0])

    usable = cs.usable_rows(n)
    u_row = usable - 1  # last active row (z reaches its final product here)
    l0 = _lagrange_one_hot(domain, [0])
    llast = _lagrange_one_hot(domain, [u_row])
    lblind = _lagrange_one_hot(domain, range(usable, n))
    l0_coeff = nttmod.intt(jnp.asarray(l0), k)
    llast_coeff = nttmod.intt(jnp.asarray(llast), k)
    lblind_coeff = nttmod.intt(jnp.asarray(lblind), k)

    omega = domain.omega
    omega_pows = [1] * n
    for i in range(1, n):
        omega_pows[i] = omega_pows[i - 1] * omega % FR_MOD
    identity_base = []
    for j in range(len(cs.permutation_columns)):
        dj = pow(DELTA, j, FR_MOD)
        arr = np.empty((n, ff.L), dtype=np.uint32)
        for i in range(n):
            arr[i] = FR.encode(dj * omega_pows[i] % FR_MOD)
        identity_base.append(arr)

    vk = VerifyingKey(cs, domain, fixed_comm, sigma_comm)
    return ProvingKey(
        vk=vk,
        fixed_lagrange=fixed_lagrange,
        fixed_coeff=fixed_coeff,
        fixed_ext=fixed_ext,
        sigma_lagrange=sigma_lagrange,
        sigma_coeff=sigma_coeff,
        sigma_ext=sigma_ext,
        l0_ext=domain.coeff_to_extended(l0_coeff),
        llast_ext=domain.coeff_to_extended(llast_coeff),
        lblind_ext=domain.coeff_to_extended(lblind_coeff),
        l0_coeff=l0_coeff,
        llast_coeff=llast_coeff,
        lblind_coeff=lblind_coeff,
        identity_base=identity_base,
    )
