"""BRICS-style fragment decomposition (MOSES `Frag` metric substrate).

The reference's metric suite (moses.get_all_metrics, used from
Inference/uc_sampling.py:26-39) includes `Frag/Test`: cosine similarity
between fragment-frequency vectors, where fragments come from RDKit's
BRICS decomposition (Degen et al. 2008). RDKit is not part of this
framework's environment, so this module implements a BRICS-style rule
table over the in-repo molecular graph: retrosynthetically meaningful
acyclic single bonds (amide, ester, sulfonamide, aryl ether/amine,
biaryl and ring-linker bonds) are cleaved simultaneously and the
resulting connected components become fragments, keyed by canonical
SMILES plus attachment-point count (the stand-in for RDKit's [n*]
dummy labels).

This is a documented approximation: the exact BRICS environment table
(L1-L16) is finer-grained, so absolute fragment sets differ from
RDKit's, but the metric is computed with the SAME decomposition on
both the generated and reference sets, which is what a distribution-
similarity score needs.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Optional, Sequence, Set, Tuple

from gctplus_tpu.chem.canonical import write_smiles
from gctplus_tpu.chem.mol import Mol
from gctplus_tpu.chem.sanitize import mol_from_smiles
from gctplus_tpu.chem.scaffold import _subgraph


def _ring_atoms(mol: Mol) -> Set[int]:
    out: Set[int] = set()
    for ring in mol.ring_info():
        out.update(ring)
    return out


def _is_carbonyl_c(mol: Mol, i: int) -> bool:
    a = mol.atoms[i]
    if a.symbol != "C" or a.aromatic:
        return False
    return any(b.order == 2.0 and mol.atoms[b.other(i)].symbol == "O"
               for b in mol.bonds_of(i))


def _is_sulfonyl_s(mol: Mol, i: int) -> bool:
    a = mol.atoms[i]
    if a.symbol != "S":
        return False
    n_dbl_o = sum(1 for b in mol.bonds_of(i)
                  if b.order == 2.0 and mol.atoms[b.other(i)].symbol == "O")
    return n_dbl_o >= 2


def _heavy_side_size(mol: Mol, start: int, banned_bond: Tuple[int, int]) -> int:
    """Heavy-atom count reachable from `start` without crossing the
    cleaved bond (to veto cleavages that strand tiny fragments)."""
    seen = {start}
    stack = [start]
    while stack:
        u = stack.pop()
        for v in mol.neighbors(u):
            if {u, v} == set(banned_bond) or v in seen:
                continue
            seen.add(v)
            stack.append(v)
    return len(seen)


def find_brics_bonds(mol: Mol) -> List[int]:
    """Indices of cleavable bonds (BRICS-style rule subset)."""
    rings = _ring_atoms(mol)
    out: List[int] = []
    for bi, b in enumerate(mol.bonds):
        # post-kekulization, order 1.0 is a true single bond even when
        # the aromatic flag is set (biaryl bond between two aromatic
        # atoms); in-ring bonds are excluded below.
        if b.order != 1.0:
            continue
        i, j = b.a1, b.a2
        ai, aj = mol.atoms[i], mol.atoms[j]
        if ai.charge or aj.charge:
            continue
        in_ring_bond = False
        for ring in mol.ring_info():
            ring_set = set(ring)
            if i in ring_set and j in ring_set:
                # verify consecutive in that cycle
                k = ring.index(i)
                if ring[(k + 1) % len(ring)] == j or ring[k - 1] == j:
                    in_ring_bond = True
                    break
        if in_ring_bond:
            continue

        def _match(x: int, y: int) -> bool:
            ax, ay = mol.atoms[x], mol.atoms[y]
            # amide / ester / generic acyl: carbonyl-C to N or O
            if _is_carbonyl_c(mol, x) and ay.symbol in ("N", "O"):
                return True
            # sulfonamide: sulfonyl-S to N
            if _is_sulfonyl_s(mol, x) and ay.symbol == "N":
                return True
            # biaryl / direct ring-ring single bond
            if x in rings and y in rings:
                return True
            # aryl/ring ether or amine: ring atom to acyclic O/N of
            # degree >= 2 (never cleaves terminal OH/NH2)
            if (x in rings and y not in rings and ay.symbol in ("N", "O")
                    and len(mol.neighbors(y)) >= 2):
                return True
            # ring to aliphatic-C linker (the chain must be substantial)
            if (x in rings and y not in rings and ay.symbol == "C"
                    and not ay.aromatic and len(mol.neighbors(y)) >= 2):
                return True
            # thioether: acyclic divalent S to C (BRICS L11)
            if (ax.symbol == "S" and x not in rings
                    and not _is_sulfonyl_s(mol, x)
                    and len(mol.neighbors(x)) == 2 and ay.symbol == "C"):
                return True
            # dialkyl ether / amine: acyclic O/N of degree >= 2 to
            # non-aromatic C (BRICS L3/L5; terminal OH/NH2 never cleave)
            if (ax.symbol in ("N", "O") and x not in rings
                    and len(mol.neighbors(x)) >= 2 and ay.symbol == "C"
                    and not ay.aromatic and not _is_carbonyl_c(mol, y)):
                return True
            # allylic/vinylic attachment: acyclic sp2 C of a C=C to C
            # (BRICS L7)
            if (ax.symbol == "C" and not ax.aromatic and x not in rings
                    and ay.symbol == "C"
                    and any(b2.order == 2.0
                            and mol.atoms[b2.other(x)].symbol == "C"
                            for b2 in mol.bonds_of(x))):
                return True
            return False

        if not (_match(i, j) or _match(j, i)):
            continue
        # BRICS never strands tiny pieces: both sides keep >= 3 heavies
        if (_heavy_side_size(mol, i, (i, j)) < 3
                or _heavy_side_size(mol, j, (i, j)) < 3):
            continue
        out.append(bi)
    return out


def _components_without(mol: Mol, cut: Set[int]) -> List[Set[int]]:
    seen: Set[int] = set()
    comps: List[Set[int]] = []
    for s in range(mol.num_atoms()):
        if s in seen:
            continue
        comp = {s}
        seen.add(s)
        stack = [s]
        while stack:
            u = stack.pop()
            for bi in mol._adj[u]:
                if bi in cut:
                    continue
                v = mol.bonds[bi].other(u)
                if v not in seen:
                    seen.add(v)
                    comp.add(v)
                    stack.append(v)
        comps.append(comp)
    return comps


def brics_fragments(smiles: str) -> Optional[List[str]]:
    """SMILES -> list of fragment keys `canonical|n_attach` (None if the
    molecule is invalid). An uncleavable molecule is its own single
    fragment with 0 attachments — same convention as RDKit BRICS."""
    mol = mol_from_smiles(smiles)
    if mol is None:
        return None
    cut = set(find_brics_bonds(mol))
    comps = _components_without(mol, cut)
    n_att: Dict[int, int] = {ci: 0 for ci in range(len(comps))}
    if cut:
        where = {}
        for ci, comp in enumerate(comps):
            for a in comp:
                where[a] = ci
        for bi in cut:
            b = mol.bonds[bi]
            n_att[where[b.a1]] += 1
            n_att[where[b.a2]] += 1
    from gctplus_tpu.chem.canonical import canonical_smiles

    keys: List[str] = []
    for ci, comp in enumerate(comps):
        sub = _subgraph(mol, comp)
        try:
            # write with identity ranks (cheap — skips the Python
            # canonical ranking) and canonicalize the STRING via the
            # (native-fast) round-trip; canonical output is
            # input-order independent, so the key is unchanged
            raw = write_smiles(sub, ranks=list(range(sub.num_atoms())))
            canon = canonical_smiles(raw)
            if canon is None:
                canon = raw
        except Exception:
            continue
        keys.append(f"{canon}|{n_att[ci]}")
    return keys or None


def fragment_counts(smiles: Sequence[str], n_jobs: int = 1) -> Counter:
    """Fragment-frequency vector over a molecule set (invalids skipped)."""
    from gctplus_tpu.chem.mapper import pmap

    counts: Counter = Counter()
    for keys in pmap(brics_fragments, smiles, n_jobs):
        if keys:
            counts.update(keys)
    return counts


def fragment_cosine(a: Counter, b: Counter) -> float:
    """Cosine similarity between two fragment-frequency vectors (the
    moses Frag formula, moses/metrics cos_similarity)."""
    import math

    if not a or not b:
        return float(bool(a) == bool(b))
    dot = sum(v * b[k] for k, v in a.items() if k in b)
    na = math.sqrt(sum(v * v for v in a.values()))
    nb = math.sqrt(sum(v * v for v in b.values()))
    return dot / (na * nb)
