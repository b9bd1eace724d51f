"""Minimal molecular graph + SMILES parser (RDKit replacement, from scratch).

The reference delegates all chemistry to RDKit's C++ core
(Utils/smiles.py, Utils/properties.py). That wheel is not part of this
framework's environment, so the chemistry substrate is implemented
in-repo: a SMILES parser producing a molecular graph, valence-based
sanitization (the validity oracle), kekulization of aromatic systems,
canonicalization, Murcko scaffolds, fingerprints and descriptors.

Supported SMILES subset: full organic subset (B C N O P S F Cl Br I),
aromatic lowercase atoms (b c n o s p), bracket atoms with isotope /
charge / explicit H / chirality (@, @@) markers, ring closures
(digits and %NN), branches, bond symbols - = # $ : / \\ ~, and
dot-separated fragments. This covers the MOSES/ChEMBL-like drug
space the reference operates on.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

# Default valences per element (RDKit's default valence model for the
# organic subset; used for implicit-H assignment and sanity checks).
DEFAULT_VALENCES: Dict[str, Tuple[int, ...]] = {
    "B": (3,),
    "C": (4,),
    "N": (3,),
    "O": (2,),
    "P": (3, 5),
    "S": (2, 4, 6),
    "F": (1,),
    "Cl": (1,),
    "Br": (1,),
    "I": (1,),
    "H": (1,),
}

ORGANIC_SUBSET = {"B", "C", "N", "O", "P", "S", "F", "Cl", "Br", "I"}
AROMATIC_OK = {"B", "C", "N", "O", "P", "S", "Se", "As"}

# electronegative enough to host a charge etc. — anything else must be
# written in brackets; bracket atoms accept any element symbol.
_ELEMENTS = {
    "H", "He", "Li", "Be", "B", "C", "N", "O", "F", "Ne", "Na", "Mg", "Al",
    "Si", "P", "S", "Cl", "Ar", "K", "Ca", "Sc", "Ti", "V", "Cr", "Mn",
    "Fe", "Co", "Ni", "Cu", "Zn", "Ga", "Ge", "As", "Se", "Br", "Kr",
    "Rb", "Sr", "Y", "Zr", "Nb", "Mo", "Tc", "Ru", "Rh", "Pd", "Ag", "Cd",
    "In", "Sn", "Sb", "Te", "I", "Xe", "Cs", "Ba", "Pt", "Au", "Hg", "Tl",
    "Pb", "Bi",
}

BOND_ORDER = {"-": 1.0, "=": 2.0, "#": 3.0, "$": 4.0, ":": 1.5, "~": 1.0,
              "/": 1.0, "\\": 1.0}


@dataclasses.dataclass
class Atom:
    symbol: str                 # canonical element symbol, e.g. "N"
    aromatic: bool = False
    charge: int = 0
    explicit_h: Optional[int] = None   # from brackets; None = implicit
    isotope: int = 0
    chiral: Optional[str] = None       # "@" or "@@" (kept, not interpreted)
    in_bracket: bool = False
    idx: int = -1
    # filled by sanitize:
    n_h: int = 0                       # total hydrogens
    degree: int = 0

    def copy(self):
        return dataclasses.replace(self)


@dataclasses.dataclass
class Bond:
    a1: int
    a2: int
    order: float                # 1, 2, 3, 4, or 1.5 for aromatic
    aromatic: bool = False
    stereo: Optional[str] = None  # '/' or '\\' as written

    def other(self, i: int) -> int:
        return self.a2 if i == self.a1 else self.a1


class Mol:
    """Editable molecular graph."""

    def __init__(self):
        self.atoms: List[Atom] = []
        self.bonds: List[Bond] = []
        self._adj: Dict[int, List[int]] = {}

    # --- construction -------------------------------------------------
    def add_atom(self, atom: Atom) -> int:
        atom.idx = len(self.atoms)
        self.atoms.append(atom)
        self._adj[atom.idx] = []
        return atom.idx

    def add_bond(self, a1: int, a2: int, order: float, aromatic=False,
                 stereo=None) -> int:
        if a1 == a2:
            raise ValueError("self-bond")
        for bi in self._adj[a1]:
            b = self.bonds[bi]
            if b.other(a1) == a2:
                raise ValueError("duplicate bond")
        b = Bond(a1, a2, order, aromatic, stereo)
        bi = len(self.bonds)
        self.bonds.append(b)
        self._adj[a1].append(bi)
        self._adj[a2].append(bi)
        return bi

    # --- queries --------------------------------------------------------
    def neighbors(self, i: int) -> List[int]:
        return [self.bonds[bi].other(i) for bi in self._adj[i]]

    def bonds_of(self, i: int) -> List[Bond]:
        return [self.bonds[bi] for bi in self._adj[i]]

    def num_atoms(self) -> int:
        return len(self.atoms)

    def get_bond(self, a1: int, a2: int) -> Optional[Bond]:
        for bi in self._adj[a1]:
            b = self.bonds[bi]
            if b.other(a1) == a2:
                return b
        return None

    # --- ring perception ------------------------------------------------
    def ring_info(self) -> List[List[int]]:
        """SSSR-ish ring set: cycle basis via BFS spanning tree, then
        shortest-ring refinement good enough for drug-like molecules."""
        return _cycle_basis(self)

    def rings_for_atom(self) -> Dict[int, List[List[int]]]:
        out: Dict[int, List[List[int]]] = {i: [] for i in range(len(self.atoms))}
        for ring in self.ring_info():
            for a in ring:
                out[a].append(ring)
        return out


def _cycle_basis(mol: Mol) -> List[List[int]]:
    """SSSR-like ring set: for every non-tree (chord) edge, the
    SHORTEST cycle through it (BFS with the chord removed). Gives the
    expected small rings for fused drug-like systems (naphthalene ->
    two 6-rings, not a 6+10 basis)."""
    import collections

    n = mol.num_atoms()
    visited = [False] * n
    tree_edges = set()
    for root in range(n):
        if visited[root]:
            continue
        dq = collections.deque([root])
        visited[root] = True
        while dq:
            u = dq.popleft()
            for bi in mol._adj[u]:
                v = mol.bonds[bi].other(u)
                if not visited[v]:
                    visited[v] = True
                    tree_edges.add((min(u, v), max(u, v)))
                    dq.append(v)

    rings: List[List[int]] = []
    seen_rings = set()
    for chord in mol.bonds:
        e = (min(chord.a1, chord.a2), max(chord.a1, chord.a2))
        if e in tree_edges:
            continue
        # BFS shortest path a1 -> a2 avoiding the chord itself
        src, dst = chord.a1, chord.a2
        prev = {src: -1}
        dq = collections.deque([src])
        while dq and dst not in prev:
            u = dq.popleft()
            for bi in mol._adj[u]:
                b = mol.bonds[bi]
                if b is chord:
                    continue
                v = b.other(u)
                if v not in prev:
                    prev[v] = u
                    dq.append(v)
        if dst not in prev:
            continue
        path = [dst]
        while path[-1] != src:
            path.append(prev[path[-1]])
        key = frozenset(path)
        if len(path) >= 3 and key not in seen_rings:
            seen_rings.add(key)
            rings.append(path)
    rings.sort(key=len)
    return rings
