"""Molecular fingerprints + Tanimoto (RDKit replacement).

- `morgan_fingerprint`: ECFP-style circular fingerprint (default
  radius 2, 1024 bits) replacing GetMorganFingerprintAsBitVect in the
  reference's tanimoto_similarity (Utils/smiles.py:68-86).
- `path_fingerprint`: linear-path (Daylight-style) fingerprint
  replacing FingerprintMol for Murcko-scaffold similarity
  (Utils/smiles.py:147-158).
- `tanimoto` on packed uint64 bitsets; `bulk_tanimoto` does the
  all-pairs popcount on device via jnp for IntDiv-scale workloads.
"""

from __future__ import annotations

import hashlib
from typing import Optional, Set

import numpy as np

from gctplus_tpu.chem.mol import Mol
from gctplus_tpu.chem.sanitize import mol_from_smiles


def _h(data: tuple) -> int:
    b = repr(data).encode()
    return int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(), "little")


def morgan_fingerprint(mol: Mol, n_bits: int = 1024, radius: int = 2) -> np.ndarray:
    """Returns a uint8 bit vector of length n_bits."""
    inv = []
    for a in mol.atoms:
        inv.append(_h((a.symbol, a.charge, a.n_h, a.aromatic,
                       len(mol.neighbors(a.idx)), a.isotope)))
    bits: Set[int] = set(v % n_bits for v in inv)
    cur = inv
    for _ in range(radius):
        nxt = []
        for a in mol.atoms:
            env = sorted(
                (1.5 if b.aromatic else b.order, cur[b.other(a.idx)])
                for b in mol.bonds_of(a.idx))
            code = _h((cur[a.idx], tuple(env)))
            nxt.append(code)
            bits.add(code % n_bits)
        cur = nxt
    fp = np.zeros(n_bits, np.uint8)
    fp[list(bits)] = 1
    return fp


def path_fingerprint(mol: Mol, n_bits: int = 2048, max_len: int = 7) -> np.ndarray:
    """Hash all simple paths up to max_len bonds."""
    bits: Set[int] = set()

    def atom_code(i):
        a = mol.atoms[i]
        return (a.symbol, a.aromatic)

    def bond_code(b):
        return (1.5 if b.aromatic else b.order,)

    n = mol.num_atoms()
    for start in range(n):
        stack = [(start, [start], [])]
        while stack:
            u, apath, bpath = stack.pop()
            if len(bpath) >= 1:
                key = tuple(
                    x for pair in zip(map(atom_code, apath),
                                      bpath + [None]) for x in pair if x)
                rkey = tuple(
                    x for pair in zip(map(atom_code, apath[::-1]),
                                      bpath[::-1] + [None]) for x in pair if x)
                bits.add(_h(min(key, rkey)) % n_bits)
            if len(bpath) >= max_len:
                continue
            for b in mol.bonds_of(u):
                v = b.other(u)
                if v in apath:
                    continue
                stack.append((v, apath + [v], bpath + [bond_code(b)]))
    fp = np.zeros(n_bits, np.uint8)
    fp[list(bits)] = 1
    return fp


def smiles_to_morgan(smiles: str, n_bits: int = 1024,
                     radius: int = 2) -> Optional[np.ndarray]:
    if isinstance(smiles, str):
        from gctplus_tpu.native import CHEM_FALLBACK, native_morgan
        out = native_morgan(smiles, n_bits, radius)
        if out is not CHEM_FALLBACK:
            return out
    mol = mol_from_smiles(smiles)
    if mol is None:
        return None
    return morgan_fingerprint(mol, n_bits, radius)


def path_fingerprint_from_smiles(smiles: str, n_bits: int = 2048,
                                 max_len: int = 7) -> Optional[np.ndarray]:
    """Parse + path fingerprint (native fast path when available)."""
    if isinstance(smiles, str):
        from gctplus_tpu.native import CHEM_FALLBACK, native_pathfp
        out = native_pathfp(smiles, n_bits, max_len)
        if out is not CHEM_FALLBACK:
            return out
    mol = mol_from_smiles(smiles)
    if mol is None:
        return None
    return path_fingerprint(mol, n_bits, max_len)


def tanimoto(fp1: Optional[np.ndarray], fp2: Optional[np.ndarray]
             ) -> Optional[float]:
    if fp1 is None or fp2 is None:
        return None
    inter = int(np.sum((fp1 & fp2) != 0))
    union = int(np.sum((fp1 | fp2) != 0))
    return 1.0 if union == 0 else inter / union


def tanimoto_similarity(smi1: str, smi2: str) -> Optional[float]:
    """ECFP4/1024 Tanimoto (reference Utils/smiles.py:76-86)."""
    return tanimoto(smiles_to_morgan(smi1), smiles_to_morgan(smi2))


def bulk_tanimoto_matrix(fps_a: np.ndarray, fps_b: np.ndarray,
                         row_chunk: int = 4096) -> np.ndarray:
    """All-pairs Tanimoto on HOST via chunked BLAS matmul.

    fps_*: (n, bits) uint8 0/1 arrays. Returns (na, nb) float32.

    Why host, not device: in this environment every eager device op
    dispatches through a remote tunnel — a fresh remote compile per
    distinct operand shape (minutes each) plus hundreds of MB of
    result transfers, all contending with any training run on the
    chip. A chunked f32 matmul through the host BLAS covers
    30k x 50k pairs in ~1-2 min with no device involvement.
    """
    a = np.ascontiguousarray(fps_a, np.float32)
    bT = np.ascontiguousarray(fps_b.T, np.float32)
    pa = a.sum(axis=1).astype(np.float32)
    pb = bT.sum(axis=0).astype(np.float32)
    out = np.empty((a.shape[0], bT.shape[1]), np.float32)
    for i in range(0, a.shape[0], row_chunk):
        inter = a[i: i + row_chunk] @ bT
        union = pa[i: i + row_chunk, None] + pb[None, :] - inter
        # union == 0 only when both fps are all-zero: Tanimoto 1.0
        zero = union <= 0
        np.maximum(union, 1.0, out=union)
        inter[zero] = 1.0
        np.divide(inter, union, out=out[i: i + inter.shape[0]])
    return out
