"""Aromaticity perception (kekule -> aromatic form unification).

RDKit canonical SMILES always aromatizes rings, so 'C1=CC=CC=C1' and
'c1ccccc1' canonicalize identically; the uniqueness/novelty metrics
depend on that. Perception model (RDKit-default-like subset): fused
ring systems where every ring atom is sp2 (exactly one double bond to
another system atom) or a lone-pair donor (N/P with 3 sigma bonds,
O/S with 2), with a Hueckel 4n+2 pi-electron count over the system.
Covers benzene/pyridine/pyrrole/furan/thiophene/imidazole/indole/
naphthalene-class systems; exotic rings stay kekule (still valid, may
canonicalize separately — documented approximation).
"""

from __future__ import annotations

from typing import List, Set

from gctplus_tpu.chem.mol import Mol


def perceive_aromaticity(mol: Mol) -> None:
    """Mark additional aromatic atoms/bonds in-place (kekule orders kept)."""
    rings = mol.ring_info()
    if not rings:
        return
    ring_atoms: Set[int] = set()
    for r in rings:
        ring_atoms.update(r)

    # connected ring systems over ring atoms
    systems: List[Set[int]] = []
    seen: Set[int] = set()
    for a in ring_atoms:
        if a in seen:
            continue
        comp = {a}
        stack = [a]
        seen.add(a)
        while stack:
            u = stack.pop()
            for v in mol.neighbors(u):
                if v in ring_atoms and v not in seen:
                    seen.add(v)
                    comp.add(v)
                    stack.append(v)
        systems.append(comp)

    for system in systems:
        if all(mol.atoms[i].aromatic for i in system):
            continue  # already aromatic from input
        if any(mol.atoms[i].aromatic for i in system):
            continue  # mixed: leave as written
        pi = 0
        ok = True
        for i in system:
            a = mol.atoms[i]
            in_sys_double = sum(
                1 for b in mol.bonds_of(i)
                if b.order == 2.0 and b.other(i) in system)
            any_double = sum(1 for b in mol.bonds_of(i) if b.order >= 2.0)
            if in_sys_double == 1:
                pi += 1
            elif any_double > 0:
                ok = False  # exocyclic double bond breaks the ring pi
                break
            elif a.symbol in ("N", "P") and a.charge <= 0:
                pi += 2      # pyrrole-type donor
            elif a.symbol in ("O", "S") and a.charge == 0:
                pi += 2      # furan/thiophene-type donor
            elif a.symbol == "C" and a.charge == -1:
                pi += 2
            elif a.symbol == "C" and a.charge == 1:
                pi += 0
            else:
                ok = False
                break
        if not ok or pi < 2 or (pi - 2) % 4 != 0:
            continue
        # ring size guard: only aromatize systems made of 5/6/7-rings
        sizes = {len(r) for r in rings if set(r) <= system}
        if sizes and not sizes <= {5, 6, 7}:
            continue
        for i in system:
            if mol.atoms[i].symbol not in ("B", "C", "N", "O", "P", "S"):
                break
        else:
            for i in system:
                mol.atoms[i].aromatic = True
            for b in mol.bonds:
                if b.a1 in system and b.a2 in system:
                    ring_bond = any(
                        {b.a1, b.a2} <= set(r) for r in rings)
                    if ring_bond:
                        b.aromatic = True
