"""Canonical SMILES writer (RDKit MolToSmiles replacement).

Canonical ranking by iterative Morgan-style refinement over atom
invariants, then a deterministic DFS emitting ring-closure digits and
bracket atoms only when required. Two SMILES that parse+sanitize to
the same graph (same kekule/aromatic perception) produce the same
string, which is what uniqueness/novelty metrics need
(reference usage: Utils/smiles.py:47-65,131-137).

Note: stereochemistry markers (@/@@, /, \\) are DROPPED, matching the
reference's canonicalization call `MolToSmiles(..., isomericSmiles=False)`
in Utils/smiles.py:136 used for dedup.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

from gctplus_tpu.chem.mol import DEFAULT_VALENCES, Mol
from gctplus_tpu.chem.sanitize import mol_from_smiles_python as mol_from_smiles

_BOND_SYM = {1.0: "", 2.0: "=", 3.0: "#", 4.0: "$"}


def _distance_profiles(mol: Mol, base_inv) -> List[tuple]:
    """Order-independent per-atom signature: the sorted multiset of
    (graph distance, neighbor base invariant) over all atoms. This
    separates non-equivalent atoms that plain Morgan refinement can
    leave tied, making the canonical form independent of input atom
    order."""
    import collections

    n = mol.num_atoms()
    profiles = []
    for src in range(n):
        dist = {src: 0}
        dq = collections.deque([src])
        while dq:
            u = dq.popleft()
            for v in mol.neighbors(u):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        profiles.append(tuple(sorted(
            (d, base_inv[a]) for a, d in dist.items())))
    return profiles


def _partition_ranks(mol: Mol) -> List[int]:
    """Order-independent refinement WITHOUT index tie-breaking; ties
    that survive (rare) are left for the callers to resolve."""
    n = mol.num_atoms()
    ring_atoms = set()
    for ring in mol.ring_info():
        ring_atoms.update(ring)
    base = []
    for a in mol.atoms:
        base.append((
            a.symbol, a.aromatic, a.charge, a.n_h, a.isotope,
            len(mol.neighbors(a.idx)), a.idx in ring_atoms,
        ))
    profiles = _distance_profiles(mol, base)
    inv = [(base[i], profiles[i]) for i in range(n)]
    # initial ranks from sorted invariants
    order = sorted(set(inv))
    ranks = [order.index(i) for i in inv]

    def refine(ranks):
        for _ in range(2 * n + 2):
            new_keys = []
            for i in range(n):
                nb = sorted(
                    (ranks[mol.bonds[bi].other(i)],
                     1.5 if mol.bonds[bi].aromatic
                     else mol.bonds[bi].order)
                    for bi in mol._adj[i])
                new_keys.append((ranks[i], tuple(nb)))
            order = sorted(set(new_keys))
            new_ranks = [order.index(k) for k in new_keys]
            if new_ranks == ranks:
                break
            ranks = new_ranks
        return ranks

    ranks = refine(ranks)

    # ties after plain WL refinement: re-seed the invariants with
    # rank-based distance profiles (order-independent) and refine
    # again — separates non-equivalent atoms that 1-WL leaves tied, so
    # the index tie-break below only ever sees true automorphisms
    for _ in range(3):
        if len(set(ranks)) == n:
            break
        profiles = _distance_profiles(mol, ranks)
        inv = [(ranks[i], profiles[i]) for i in range(n)]
        order = sorted(set(inv))
        new_ranks = [order.index(k) for k in inv]
        new_ranks = refine(new_ranks)
        if new_ranks == ranks:
            break
        ranks = new_ranks
    return ranks


def canonical_ranks(mol: Mol) -> List[int]:
    """Partition refinement + min-index tie-break. Fast path; atoms in
    surviving tied classes are usually automorphic. For a guaranteed
    order-independent string use canonical_ranks_complete (the default
    of write_smiles)."""
    n = mol.num_atoms()
    ranks = _partition_ranks(mol)
    while len(set(ranks)) < n:
        seen: Dict[int, List[int]] = {}
        for i, r in enumerate(ranks):
            seen.setdefault(r, []).append(i)
        tied = next(v for r, v in sorted(seen.items()) if len(v) > 1)
        chosen = min(tied)
        ranks = [r * 2 for r in ranks]
        ranks[chosen] -= 1
        ranks = _refine_ranks(mol, ranks)
    return ranks


def _refine_ranks(mol: Mol, ranks: List[int]) -> List[int]:
    n = mol.num_atoms()
    for _ in range(2 * n + 2):
        new_keys = []
        for i in range(n):
            nb = sorted(
                (ranks[mol.bonds[bi].other(i)],
                 1.5 if mol.bonds[bi].aromatic else mol.bonds[bi].order)
                for bi in mol._adj[i])
            new_keys.append((ranks[i], tuple(nb)))
        order = sorted(set(new_keys))
        new_ranks = [order.index(k) for k in new_keys]
        if new_ranks == ranks:
            break
        ranks = new_ranks
    return ranks


def canonical_ranks_complete(mol: Mol, budget: Optional[int] = None,
                             isomeric: bool = False) -> List[int]:
    """Canonical ranking with exact tie handling: when refinement
    leaves a tied class (WL + distance profiles are not a complete
    graph invariant), branch on every member and keep the ranking that
    writes the lexicographically smallest SMILES. Branch count is
    bounded by `budget` leaf writes (drug-sized molecules rarely need
    more than a handful); default 64, raised to 256 for isomeric
    output where stereo markers break skeleton automorphisms and the
    truncation would be input-order dependent. A truncated search is
    detectable via `canonical_ranks_complete.last_truncated`.

    isomeric=True scores leaves on the ISOMERIC string: skeleton
    automorphisms that swap constitutionally identical arms of a
    stereocenter (cis/trans ring isomers) write different stereo
    markers, so the tie-break must see them to stay input-order
    independent."""
    if budget is None:
        budget = 256 if isomeric else 64
    canonical_ranks_complete.last_truncated = False
    n = mol.num_atoms()
    base = _partition_ranks(mol)
    if len(set(base)) == n:
        return base

    leaves = [0]
    best: List[Optional[tuple]] = [None]  # (smiles, ranks)

    def descend(ranks):
        if leaves[0] >= budget:
            canonical_ranks_complete.last_truncated = True
            return
        if len(set(ranks)) == n:
            leaves[0] += 1
            s = write_smiles(mol, ranks, isomeric=isomeric)
            if best[0] is None or s < best[0][0]:
                best[0] = (s, ranks)
            return
        seen: Dict[int, List[int]] = {}
        for i, r in enumerate(ranks):
            seen.setdefault(r, []).append(i)
        tied = next(v for r, v in sorted(seen.items()) if len(v) > 1)
        for choice in tied:
            boosted = [r * 2 for r in ranks]
            boosted[choice] -= 1
            descend(_refine_ranks(mol, boosted))

    descend(base)
    if best[0] is None:
        return base
    return best[0][1]


def _needs_bracket(a, mol: Mol) -> bool:
    if a.symbol not in DEFAULT_VALENCES or a.symbol == "H":
        return True
    if a.charge != 0 or a.isotope != 0:
        return True
    if a.aromatic and a.symbol not in ("B", "C", "N", "O", "P", "S"):
        return True
    # implicit-H consistency: writing without brackets implies the
    # default H fill; aromatic N-H (pyrrole) must keep [nH]
    bond_sum = sum(
        (1.0 if b.aromatic else b.order) for b in mol.bonds_of(a.idx))
    if a.aromatic:
        if a.symbol == "N" and a.n_h > 0:
            return True
        return False
    vlist = DEFAULT_VALENCES[a.symbol]
    v = next((v for v in vlist if v >= bond_sum), None)
    if v is None:
        return True
    return int(v - bond_sum) != a.n_h


def _atom_token(a, mol: Mol, chiral_tok: Optional[str] = None) -> str:
    sym = a.symbol.lower() if a.aromatic else a.symbol
    if chiral_tok is None and not _needs_bracket(a, mol):
        return sym
    parts = ["["]
    if a.isotope:
        parts.append(str(a.isotope))
    parts.append(sym)
    if chiral_tok:
        parts.append(chiral_tok)
    if a.n_h == 1:
        parts.append("H")
    elif a.n_h > 1:
        parts.append(f"H{a.n_h}")
    if a.charge == 1:
        parts.append("+")
    elif a.charge == -1:
        parts.append("-")
    elif a.charge > 1:
        parts.append(f"+{a.charge}")
    elif a.charge < -1:
        parts.append(f"-{-a.charge}")
    parts.append("]")
    return "".join(parts)


_FLIP_DIR = {"/": "\\", "\\": "/"}


def _perm_parity(a: List[int], b: List[int]) -> int:
    """0 if b is an even permutation of a, 1 if odd."""
    b = list(b)
    par = 0
    for i in range(len(a)):
        j = b.index(a[i], i)
        if j != i:
            b[i], b[j] = b[j], b[i]
            par ^= 1
    return par


def _chiral_token(a, parent: Optional[int],
                  out_nbrs: List[int]) -> Optional[str]:
    """@/@@ under the writer's neighbor order, parity-adjusted from the
    parse-time order (Atom.chiral_order). None when the marker cannot
    be interpreted (unsupported class, neighbor mismatch)."""
    # extended tetrahedral classes are plain @/@@ aliases (OpenSMILES:
    # @TH1 == @, @TH2 == @@); normalize so they survive round-trip
    chiral = {"@TH1": "@", "@TH2": "@@"}.get(a.chiral, a.chiral)
    if chiral not in ("@", "@@") or not a.chiral_order:
        return None
    out = ([parent] if parent is not None else []) + list(out_nbrs)
    if -1 in a.chiral_order:
        # implicit bracket H: first neighbor when the atom leads the
        # string, else immediately after the preceding atom
        out.insert(1 if parent is not None else 0, -1)
    if (sorted(out) != sorted(a.chiral_order)
            or len(set(out)) != len(out) or len(out) not in (3, 4)):
        return None
    if _perm_parity(a.chiral_order, out) == 0:
        return chiral
    return "@@" if chiral == "@" else "@"


def write_smiles(mol: Mol, ranks: Optional[List[int]] = None,
                 isomeric: bool = False) -> str:
    """Graph -> SMILES via canonical DFS.

    isomeric=True re-emits tetrahedral @/@@ (parity-corrected for the
    canonical neighbor order) and directional /\\ bonds (orientation-
    corrected, gauge-normalized so the first directional bond of every
    conjugated stereo cluster is '/'); the default drops them like the
    reference's MolToSmiles(isomericSmiles=False) dedup call."""
    n = mol.num_atoms()
    if ranks is None:
        ranks = canonical_ranks_complete(mol, isomeric=isomeric)

    visited: Set[int] = set()

    # pre-find ring-closure bonds via DFS tree
    tree_edges: Set[Tuple[int, int]] = set()

    def dfs_tree(u: int):
        visited.add(u)
        for v in sorted(mol.neighbors(u), key=lambda x: ranks[x]):
            e = (min(u, v), max(u, v))
            if v not in visited:
                tree_edges.add(e)
                dfs_tree(v)

    roots = []
    import sys
    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(10000, 4 * n + 100))
    try:
        for i in sorted(range(n), key=lambda x: ranks[x]):
            if i not in visited:
                roots.append(i)
                dfs_tree(i)

        # directional bonds are geometrically meaningful only when
        # BOTH ends of an adjacent C=C carry a directional marker;
        # half-specified markers (e.g. C/C=CC) are stripped, matching
        # RDKit's stereo perception
        live_dir: Set[int] = set()
        dir_flip: Dict[int, bool] = {}
        if isomeric:
            dir_at: Dict[int, List[int]] = {}
            for bi, b in enumerate(mol.bonds):
                if b.stereo and b.order == 1.0 and not b.aromatic:
                    dir_at.setdefault(b.a1, []).append(bi)
                    dir_at.setdefault(b.a2, []).append(bi)
            for b in mol.bonds:
                if b.order == 2.0 and not b.aromatic:
                    left = dir_at.get(b.a1, [])
                    right = dir_at.get(b.a2, [])
                    if left and right:
                        live_dir.update(left)
                        live_dir.update(right)

        def emit(record: Optional[List[Tuple[int, str]]]) -> str:
            visited.clear()
            closure_digit: Dict[Tuple[int, int], int] = {}
            next_digit = [1]
            free_digits: List[int] = []
            frags = []

            def bond_symbol(b, from_atom: int) -> str:
                if b.aromatic:
                    return ""
                if b.order == 1.0:
                    if isomeric and b.stereo is not None:
                        bi = mol.bond_index(b.a1, b.a2)
                        if bi in live_dir:
                            s = (b.stereo if from_atom == b.a1
                                 else _FLIP_DIR[b.stereo])
                            if record is not None:
                                record.append((bi, s))
                            elif dir_flip.get(bi):
                                s = _FLIP_DIR[s]
                            return s
                    # explicit single needed between two aromatic atoms
                    if mol.atoms[b.a1].aromatic and mol.atoms[b.a2].aromatic:
                        return "-"
                    return ""
                return _BOND_SYM.get(b.order, "")

            def write(u: int, parent: Optional[int]) -> str:
                visited.add(u)
                nbrs = sorted(mol.neighbors(u), key=lambda x: ranks[x])
                closures = [v for v in nbrs
                            if (min(u, v), max(u, v)) not in tree_edges]
                branches = [v for v in nbrs
                            if (min(u, v), max(u, v)) in tree_edges
                            and v not in visited]
                ctok = (_chiral_token(mol.atoms[u], parent,
                                      closures + branches)
                        if isomeric else None)
                token = [_atom_token(mol.atoms[u], mol, ctok)]
                # ring-closure digits: open at first endpoint, close at
                # the second
                for v in closures:
                    e = (min(u, v), max(u, v))
                    b = mol.get_bond(u, v)
                    if e not in closure_digit:
                        d = (free_digits.pop(0) if free_digits
                             else next_digit[0])
                        if d == next_digit[0]:
                            next_digit[0] += 1
                        closure_digit[e] = d
                    else:
                        d = closure_digit.pop(e)
                        free_digits.append(d)
                        free_digits.sort()
                    token.append(bond_symbol(b, u) + _digit(d))
                for k, v in enumerate(branches):
                    b = mol.get_bond(u, v)
                    sub = bond_symbol(b, u) + write(v, u)
                    if k < len(branches) - 1:
                        token.append("(" + sub + ")")
                    else:
                        token.append(sub)
                return "".join(token)

            for r in roots:
                if r not in visited:
                    frags.append(write(r, None))
            return ".".join(frags)

        if isomeric and live_dir:
            # pass 1: record emission order/orientation of directional
            # bonds, then normalize the gauge — flipping every symbol
            # in a stereo cluster (directional bonds coupled through
            # shared double bonds) preserves geometry, so force the
            # first-emitted symbol of each cluster to '/'
            events: List[Tuple[int, str]] = []
            emit(events)
            parent_uf: Dict[int, int] = {bi: bi for bi in live_dir}

            def find(x):
                while parent_uf[x] != x:
                    parent_uf[x] = parent_uf[parent_uf[x]]
                    x = parent_uf[x]
                return x

            by_atom: Dict[int, List[int]] = {}
            for bi in live_dir:
                b = mol.bonds[bi]
                by_atom.setdefault(b.a1, []).append(bi)
                by_atom.setdefault(b.a2, []).append(bi)
            for b in mol.bonds:
                if b.order == 2.0 and not b.aromatic:
                    grp = by_atom.get(b.a1, []) + by_atom.get(b.a2, [])
                    for x in grp[1:]:
                        parent_uf[find(grp[0])] = find(x)
            first_sym: Dict[int, str] = {}
            for bi, s in events:
                root = find(bi)
                if root not in first_sym:
                    first_sym[root] = s
            for bi in live_dir:
                dir_flip[bi] = first_sym.get(find(bi)) == "\\"
        out = emit(None)
    finally:
        sys.setrecursionlimit(old_limit)
    return out


def _digit(d: int) -> str:
    return str(d) if d < 10 else f"%{d:02d}"


def canonical_smiles(smiles: str, isomeric: bool = False) -> Optional[str]:
    """Parse+sanitize+canonical-write; None if invalid.
    (reference get_canonical, Utils/smiles.py:47-65; isomeric=True is
    the MolToSmiles(isomericSmiles=True) analog — a capability the
    reference's dedup path never exercises, so the default matches its
    isomericSmiles=False call)

    Fast path: the native kernel (native/chem.cpp, ~12x), an
    equivalence-tested port of this module; falls back here for
    oversized molecules, isomeric output, or when no compiler is
    available."""
    if isinstance(smiles, str) and not isomeric:
        from gctplus_tpu.native import CHEM_FALLBACK, native_canonical
        out = native_canonical(smiles)
        if out is not CHEM_FALLBACK:
            return out
    return canonical_smiles_python(smiles, isomeric=isomeric)


def canonical_smiles_python(smiles: str,
                            isomeric: bool = False) -> Optional[str]:
    """The pure-Python path (also the native kernel's oracle)."""
    mol = mol_from_smiles(smiles)
    if mol is None:
        return None
    return write_smiles(mol, isomeric=isomeric)
