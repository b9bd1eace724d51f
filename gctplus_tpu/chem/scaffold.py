"""Bemis-Murcko scaffolds (RDKit MurckoScaffoldSmiles replacement).

Algorithm: keep ring systems and the linker atoms connecting them;
iteratively prune terminal atoms whose bond to the remainder is a
single bond; keep degree-1 atoms attached by a double/triple bond
(exocyclic =O etc.), matching RDKit's MurckoScaffold behavior.
Reference usage: Utils/smiles.py:140-158, preprocess.py:47-50.
"""

from __future__ import annotations

from typing import Optional

from gctplus_tpu.chem.mol import Mol
from gctplus_tpu.chem.canonical import write_smiles
from gctplus_tpu.chem.sanitize import mol_from_smiles_python as mol_from_smiles


def _prune_to_scaffold_atoms(mol: Mol) -> Optional[set]:
    n = mol.num_atoms()
    keep = set(range(n))
    ring_atoms = set()
    for ring in mol.ring_info():
        ring_atoms.update(ring)
    if not ring_atoms:
        return None  # acyclic molecule: empty scaffold (RDKit returns '')

    # phase 1: strip side chains — iteratively remove non-ring atoms of
    # degree <= 1 (regardless of bond order). Remaining = rings + linkers.
    changed = True
    while changed:
        changed = False
        for i in list(keep):
            if i in ring_atoms:
                continue
            nbrs = [v for v in mol.neighbors(i) if v in keep]
            if len(nbrs) <= 1:
                keep.discard(i)
                changed = True

    # phase 2: re-attach atoms double/triple-bonded directly to the
    # skeleton (RDKit keeps exocyclic =O etc.)
    for b in mol.bonds:
        if b.order >= 2.0 and not b.aromatic:
            if b.a1 in keep and b.a2 not in keep:
                keep.add(b.a2)
            elif b.a2 in keep and b.a1 not in keep:
                keep.add(b.a1)
    return keep


def _subgraph(mol: Mol, keep: set) -> Mol:
    """Extract kept atoms; severed bonds become hydrogens (RDKit
    replaces cut bonds with H)."""
    sub = Mol()
    remap = {}
    for i in sorted(keep):
        a = mol.atoms[i].copy()
        removed = sum(
            (1.0 if b.aromatic else b.order)
            for b in mol.bonds_of(i) if b.other(i) not in keep)
        a.n_h = a.n_h + int(removed)
        a.explicit_h = a.n_h
        remap[i] = sub.add_atom(a)
    for b in mol.bonds:
        if b.a1 in keep and b.a2 in keep:
            sub.add_bond(remap[b.a1], remap[b.a2], b.order,
                         aromatic=b.aromatic, stereo=None)
    return sub


def murcko_scaffold(smiles: str) -> Optional[str]:
    """SMILES -> scaffold SMILES ('' for acyclic, None if invalid).

    Fast path: native/chem.cpp (equivalence-tested port)."""
    if isinstance(smiles, str):
        from gctplus_tpu.native import CHEM_FALLBACK, native_murcko
        out = native_murcko(smiles)
        if out is not CHEM_FALLBACK:
            return out
    return murcko_scaffold_python(smiles)


def murcko_scaffold_python(smiles: str) -> Optional[str]:
    """The pure-Python path (also the native kernel's oracle)."""
    mol = mol_from_smiles(smiles)
    if mol is None:
        return None
    keep = _prune_to_scaffold_atoms(mol)
    if keep is None:
        return ""
    sub = _subgraph(mol, keep)
    try:
        # round-trip through the writer+sanitizer to renormalize
        raw = write_smiles(sub)
        out = mol_from_smiles(raw)
        if out is None:
            return None
        return write_smiles(out)
    except Exception:
        return None


def murcko_scaffold_similarity(smi1: str, smi2: str, n_bits: int = 2048):
    """Tanimoto between scaffold fingerprints (reference
    Utils/smiles.py:147-158 uses path-based FingerprintMol; we use the
    in-repo path fingerprint)."""
    from gctplus_tpu.chem.fingerprints import (
        path_fingerprint_from_smiles, tanimoto)

    s1, s2 = murcko_scaffold(smi1), murcko_scaffold(smi2)
    if s1 is None or s2 is None:
        return None
    if s1 == "" or s2 == "":
        return 1.0 if s1 == s2 else 0.0
    f1 = path_fingerprint_from_smiles(s1, n_bits)
    f2 = path_fingerprint_from_smiles(s2, n_bits)
    if f1 is None or f2 is None:
        return None
    return tanimoto(f1, f2)
