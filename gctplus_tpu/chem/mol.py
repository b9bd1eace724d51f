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
    # written neighbor order at parse time for chiral atoms (OpenSMILES
    # §3.9.2 accounting: preceding atom, implicit bracket H as -1, then
    # ring-closure digits and branch atoms in written order). Consumed
    # by the isomeric canonical writer to re-derive @/@@ parity under
    # the canonical output ordering.
    chiral_order: Optional[List[int]] = None
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
        self._ring_cache: Optional[List[List[int]]] = None

    # --- construction -------------------------------------------------
    def add_atom(self, atom: Atom) -> int:
        atom.idx = len(self.atoms)
        self.atoms.append(atom)
        self._adj[atom.idx] = []
        self._ring_cache = None
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
        self._ring_cache = None
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

    def bond_index(self, a1: int, a2: int) -> int:
        for bi in self._adj[a1]:
            if self.bonds[bi].other(a1) == a2:
                return bi
        raise KeyError((a1, a2))

    # --- ring perception ------------------------------------------------
    def ring_info(self) -> List[List[int]]:
        """Minimum cycle basis (cached; descriptors/scaffold/aromatic
        perception all consume it)."""
        if self._ring_cache is None:
            self._ring_cache = _cycle_basis(self)
        return self._ring_cache

    def rings_for_atom(self) -> Dict[int, List[List[int]]]:
        out: Dict[int, List[List[int]]] = {i: [] for i in range(len(self.atoms))}
        for ring in self.ring_info():
            for a in ring:
                out[a].append(ring)
        return out


def _cycle_basis(mol: Mol) -> List[List[int]]:
    """Minimum cycle basis (Horton): candidate cycles are, for every
    vertex v and edge (x, y), SP(v,x) + (x,y) + SP(y,v); candidates are
    sorted by length and greedily selected while linearly independent
    over GF(2) on edge-incidence vectors, until the cyclomatic number
    is reached. Exact small rings for fused drug-like systems (the
    previous chord heuristic could LOSE rings when two chords shared a
    shortest cycle), and the resulting ring set is independent of atom
    input order up to tie choices among equal-size rings."""
    import collections

    n = mol.num_atoms()
    m = len(mol.bonds)
    if m < n:
        n_comp = _n_components(mol)
        if m - n + n_comp <= 0:
            return []
    n_comp = _n_components(mol)
    dim = m - n + n_comp
    if dim <= 0:
        return []

    # BFS shortest-path parents from every vertex
    parents: List[Dict[int, int]] = []
    dists: List[Dict[int, int]] = []
    for src in range(n):
        prev = {src: -1}
        dist = {src: 0}
        dq = collections.deque([src])
        while dq:
            u = dq.popleft()
            for bi in mol._adj[u]:
                v = mol.bonds[bi].other(u)
                if v not in prev:
                    prev[v] = u
                    dist[v] = dist[u] + 1
                    dq.append(v)
        parents.append(prev)
        dists.append(dist)

    def path(src, dst):
        prev = parents[src]
        if dst not in prev:
            return None
        out = [dst]
        while out[-1] != src:
            out.append(prev[out[-1]])
        return out  # dst..src

    edge_index = {}
    for bi, b in enumerate(mol.bonds):
        edge_index[(min(b.a1, b.a2), max(b.a1, b.a2))] = bi

    # candidate cycles
    seen = set()
    candidates: List[Tuple[int, frozenset, List[int]]] = []
    for v in range(n):
        for b in mol.bonds:
            x, y = b.a1, b.a2
            px = path(v, x)
            py = path(v, y)
            if px is None or py is None:
                continue
            # paths must be disjoint except at v
            sx, sy = set(px), set(py)
            if sx & sy != {v}:
                continue
            cyc = px[:-1] + [v] + py[:-1][::-1]
            # cyc: x..(v)..y, plus edge (x,y) closes it
            if len(cyc) < 3:
                continue
            key = frozenset(cyc)
            if key in seen:
                continue
            # verify it is a simple cycle (consecutive edges exist)
            ok = True
            for k in range(len(cyc)):
                e = (min(cyc[k], cyc[(k + 1) % len(cyc)]),
                     max(cyc[k], cyc[(k + 1) % len(cyc)]))
                if e not in edge_index:
                    ok = False
                    break
            if not ok:
                continue
            seen.add(key)
            candidates.append((len(cyc), key, cyc))

    candidates.sort(key=lambda t: (t[0], sorted(t[1])))

    # greedy GF(2) independence on edge vectors (pivot elimination)
    pivots: Dict[int, int] = {}  # leading-bit -> row
    rings: List[List[int]] = []
    for _, key, cyc in candidates:
        vec = 0
        for k in range(len(cyc)):
            e = (min(cyc[k], cyc[(k + 1) % len(cyc)]),
                 max(cyc[k], cyc[(k + 1) % len(cyc)]))
            vec |= 1 << edge_index[e]
        red = vec
        while red:
            lb = red.bit_length()
            if lb in pivots:
                red ^= pivots[lb]
            else:
                pivots[lb] = red
                rings.append(cyc)
                break
        if len(rings) == dim:
            break
    rings.sort(key=len)
    return rings


def _n_components(mol: Mol) -> int:
    n = mol.num_atoms()
    seen = set()
    comp = 0
    for s in range(n):
        if s in seen:
            continue
        comp += 1
        stack = [s]
        seen.add(s)
        while stack:
            u = stack.pop()
            for v in mol.neighbors(u):
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
    return comp
