// Native chemistry kernel: SMILES parse -> sanitize (kekulize +
// aromaticity perception) -> canonical write, plus Bemis-Murcko
// scaffolds. A faithful C++ port of the in-repo Python substrate
// (chem/{smiles_parser,mol,sanitize,aromatic,canonical,scaffold}.py),
// which itself replaces RDKit's C++ core for the reference's
// get_mol/get_canonical/MurckoScaffoldSmiles usage
// (reference Utils/smiles.py:30-65,131-158).
//
// EQUIVALENCE CONTRACT: for every input, the canonical string (or
// invalid verdict) must MATCH the Python implementation byte-for-byte
// — uniqueness/novelty metrics and scaffold equality depend on string
// identity. tests/test_native_chem.py asserts this over corpus
// samples. Tie-breaking (candidate sort order in the cycle basis,
// stable sorts in rank refinement, DFS neighbor order, kekulization
// backtracking order) is therefore ported exactly, including
// quirks.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC chem.cpp -o libgctchem.so
// (native/__init__.py builds on first use, with Python fallback).

#include <cmath>
#include <algorithm>
#include <array>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <functional>
#include <map>
#include <set>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

// ---------------------------------------------------------------- types

struct ChemError {};  // any parse/sanitize failure -> invalid molecule

struct Atom {
  std::string symbol;   // canonical element symbol, e.g. "N", "Cl"
  bool aromatic = false;
  int charge = 0;
  int explicit_h = -1;  // -1 = None (no bracket H specified)
  int isotope = 0;
  bool in_bracket = false;
  int n_h = 0;
  int degree = 0;
  int chiral = 0;       // 0 none, 1 '@', 2 '@@' (suffix dropped)
};

// order2 = 2*order: 2 single, 3 aromatic(parse), 4 double, 6 triple,
// 8 quadruple. Kekulized aromatic bonds become 4 or 2 with
// aromatic=true kept.
struct Bond {
  int a1, a2;
  int order2;
  bool aromatic = false;
  int stereo = 0;  // 0 none, 1 '/', 2 '\'
  int other(int i) const { return i == a1 ? a2 : a1; }
};

struct Mol {
  std::vector<Atom> atoms;
  std::vector<Bond> bonds;
  std::vector<std::vector<int>> adj;  // atom -> bond indices
  bool rings_done = false;
  std::vector<std::vector<int>> rings;

  int add_atom(const Atom& a) {
    atoms.push_back(a);
    adj.emplace_back();
    rings_done = false;
    return (int)atoms.size() - 1;
  }
  void add_bond(int a1, int a2, int order2, bool aromatic, int stereo) {
    if (a1 == a2) throw ChemError{};
    for (int bi : adj[a1])
      if (bonds[bi].other(a1) == a2) throw ChemError{};  // duplicate
    Bond b{a1, a2, order2, aromatic, stereo};
    bonds.push_back(b);
    adj[a1].push_back((int)bonds.size() - 1);
    adj[a2].push_back((int)bonds.size() - 1);
    rings_done = false;
  }
  std::vector<int> neighbors(int i) const {
    std::vector<int> out;
    out.reserve(adj[i].size());
    for (int bi : adj[i]) out.push_back(bonds[bi].other(i));
    return out;
  }
  const Bond* get_bond(int a1, int a2) const {
    for (int bi : adj[a1])
      if (bonds[bi].other(a1) == a2) return &bonds[bi];
    return nullptr;
  }
  int num_atoms() const { return (int)atoms.size(); }
};

// ----------------------------------------------------------- constants

// DEFAULT_VALENCES (mol.py:25-37)
const std::map<std::string, std::vector<int>> kDefaultValences = {
    {"B", {3}},  {"C", {4}},        {"N", {3}}, {"O", {2}},
    {"P", {3, 5}}, {"S", {2, 4, 6}}, {"F", {1}}, {"Cl", {1}},
    {"Br", {1}}, {"I", {1}},        {"H", {1}},
};

const std::set<std::string> kOrganicSubset = {
    "B", "C", "N", "O", "P", "S", "F", "Cl", "Br", "I"};
const std::set<std::string> kAromaticOk = {"B", "C", "N",  "O",
                                           "P", "S", "Se", "As"};

// _CHARGED_VALENCES (sanitize.py:23-30)
const std::map<std::pair<std::string, int>, std::vector<int>>
    kChargedValences = {
        {{"N", 1}, {4}},    {{"N", -1}, {2}}, {{"P", 1}, {4, 6}},
        {{"P", -1}, {2}},   {{"O", 1}, {3}},  {{"O", -1}, {1}},
        {{"S", 1}, {3, 5}}, {{"S", -1}, {1}}, {{"C", 1}, {3}},
        {{"C", -1}, {3}},   {{"B", -1}, {4}}, {{"B", 1}, {2}},
};

const std::vector<int>* allowed_valences(const std::string& sym, int q) {
  if (q == 0) {
    auto it = kDefaultValences.find(sym);
    return it == kDefaultValences.end() ? nullptr : &it->second;
  }
  auto it = kChargedValences.find({sym, q});
  return it == kChargedValences.end() ? nullptr : &it->second;
}

// ------------------------------------------------------------- parser
// smiles_parser.py:69-201

bool is_upper(char c) { return c >= 'A' && c <= 'Z'; }
bool is_lower(char c) { return c >= 'a' && c <= 'z'; }
bool is_digit(char c) { return c >= '0' && c <= '9'; }

int bond_order2(char sym) {
  switch (sym) {
    case '-': return 2;
    case '=': return 4;
    case '#': return 6;
    case '$': return 8;
    case ':': return 3;
    case '~': return 2;
    case '/': return 2;
    case '\\': return 2;
  }
  return 0;
}
bool is_bond_char(char c) {
  return c == '-' || c == '=' || c == '#' || c == '$' || c == ':' ||
         c == '~' || c == '/' || c == '\\';
}

// _parse_bracket (smiles_parser.py:39-66); emulates the anchored
// regex incl. the alternation backtracking for se/as/te/si.
Atom parse_bracket(const std::string& body) {
  size_t i = 0, n = body.size();
  Atom atom;
  atom.in_bracket = true;
  // isotope
  size_t iso0 = i;
  while (i < n && is_digit(body[i])) i++;
  if (i > iso0) atom.isotope = std::stoi(body.substr(iso0, i - iso0));
  // symbol: regex order ([A-Z][a-z]?|[bcnops]|se|as|te|si); after the
  // symbol the only legal chars are @ H + - : or end, none lowercase,
  // so 1-char lowercase matches need a 2-char retry only when the next
  // char would be illegal and the pair is in {se,as,te,si}.
  if (i >= n) throw ChemError{};
  std::string sym;
  bool aromatic = false;
  char c = body[i];
  auto legal_after = [&](size_t j) {
    if (j >= n) return true;
    char d = body[j];
    return d == '@' || d == 'H' || d == '+' || d == '-' || d == ':';
  };
  if (is_upper(c)) {
    if (i + 1 < n && is_lower(body[i + 1]) && legal_after(i + 2)) {
      sym = body.substr(i, 2);
      i += 2;
    } else {
      sym = std::string(1, c);
      i += 1;
    }
  } else if (is_lower(c)) {
    std::string one(1, c);
    std::string two = (i + 1 < n) ? body.substr(i, 2) : "";
    bool one_ok = std::string("bcnops").find(c) != std::string::npos &&
                  legal_after(i + 1);
    bool two_ok = (two == "se" || two == "as" || two == "te" ||
                   two == "si") && legal_after(i + 2);
    if (one_ok) {
      sym = one;
      i += 1;
    } else if (two_ok) {
      sym = two;
      i += 2;
    } else {
      throw ChemError{};
    }
    aromatic = true;
  } else {
    throw ChemError{};
  }
  if (aromatic) {
    sym[0] = (char)(sym[0] - 'a' + 'A');  // capitalize
    if (!kAromaticOk.count(sym)) throw ChemError{};
  }
  atom.symbol = sym;
  atom.aromatic = aromatic;
  // chiral: @{1,2}(TH\d|AL\d|SP\d|TB\d+|OH\d+)? — suffix dropped
  if (i < n && body[i] == '@') {
    i++;
    atom.chiral = 1;
    if (i < n && body[i] == '@') {
      i++;
      atom.chiral = 2;
    }
    if (i + 2 < n) {
      std::string tag = body.substr(i, 2);
      if (tag == "TH" || tag == "AL" || tag == "SP") {
        if (i + 2 < n && is_digit(body[i + 2])) i += 3;
      } else if (tag == "TB" || tag == "OH") {
        size_t j = i + 2;
        while (j < n && is_digit(body[j])) j++;
        if (j > i + 2) i = j;
      }
    }
  }
  // hcount: H\d*
  atom.explicit_h = 0;  // bracket atoms: None -> 0 (parser line 50-55)
  if (i < n && body[i] == 'H') {
    i++;
    size_t h0 = i;
    while (i < n && is_digit(body[i])) i++;
    atom.explicit_h = (i > h0) ? std::stoi(body.substr(h0, i - h0)) : 1;
  }
  // charge: +{1,3}|-{1,3}|\+\d+|-\d+
  if (i < n && (body[i] == '+' || body[i] == '-')) {
    char sign = body[i];
    if (i + 1 < n && is_digit(body[i + 1])) {
      size_t j = i + 1;
      while (j < n && is_digit(body[j])) j++;
      atom.charge = std::stoi(body.substr(i + 1, j - i - 1)) *
                    (sign == '+' ? 1 : -1);
      i = j;
    } else {
      int run = 0;
      while (i < n && body[i] == sign && run < 3) {
        run++;
        i++;
      }
      if (i < n && body[i] == sign) throw ChemError{};  // >3
      atom.charge = (sign == '+' ? run : -run);
    }
  }
  // map: :\d+
  if (i < n && body[i] == ':') {
    i++;
    size_t m0 = i;
    while (i < n && is_digit(body[i])) i++;
    if (i == m0) throw ChemError{};
  }
  if (i != n) throw ChemError{};
  return atom;
}

void make_bond(Mol& mol, int a1, int a2, int sym /*0 = none*/) {
  if (sym == 0) {
    if (mol.atoms[a1].aromatic && mol.atoms[a2].aromatic)
      mol.add_bond(a1, a2, 3, true, 0);
    else
      mol.add_bond(a1, a2, 2, false, 0);
  } else if (sym == ':') {
    mol.add_bond(a1, a2, 3, true, 0);
  } else if (sym == '/' || sym == '\\') {
    mol.add_bond(a1, a2, 2, false, sym == '/' ? 1 : 2);
  } else if (sym == '~') {
    mol.add_bond(a1, a2, 2, false, 0);
  } else {
    mol.add_bond(a1, a2, bond_order2((char)sym), false, 0);
  }
}

Mol parse_smiles(const std::string& s) {
  if (s.empty()) throw ChemError{};
  Mol mol;
  int prev = -1;
  std::vector<int> stack;
  int pending = 0;  // 0 = none, else the bond char
  std::map<int, std::pair<int, int>> ring;  // num -> (atom, bond_sym)

  size_t i = 0, n = s.size();
  auto attach = [&](const Atom& atom) {
    int idx = mol.add_atom(atom);
    if (prev >= 0)
      make_bond(mol, prev, idx, pending);
    else if (pending != 0)
      throw ChemError{};
    prev = idx;
    pending = 0;
  };
  while (i < n) {
    char ch = s[i];
    if (ch == '[') {
      size_t j = s.find(']', i);
      if (j == std::string::npos) throw ChemError{};
      attach(parse_bracket(s.substr(i + 1, j - i - 1)));
      i = j + 1;
      continue;
    }
    if (is_upper(ch) || is_lower(ch)) {
      Atom atom;
      if (is_upper(ch)) {
        std::string two = (i + 1 < n) ? s.substr(i, 2) : "";
        if (two == "Cl" || two == "Br") {
          atom.symbol = two;
          i += 2;
        } else {
          atom.symbol = std::string(1, ch);
          i += 1;
        }
        if (!kOrganicSubset.count(atom.symbol)) throw ChemError{};
      } else {
        if (std::string("bcnops").find(ch) == std::string::npos)
          throw ChemError{};
        atom.symbol = std::string(1, (char)(ch - 'a' + 'A'));
        atom.aromatic = true;
        i += 1;
      }
      attach(atom);
      continue;
    }
    if (is_bond_char(ch)) {
      if (pending != 0) throw ChemError{};
      pending = ch;
      i += 1;
      continue;
    }
    if (ch == '(') {
      if (prev < 0) throw ChemError{};
      stack.push_back(prev);
      i += 1;
      continue;
    }
    if (ch == ')') {
      if (stack.empty()) throw ChemError{};
      prev = stack.back();
      stack.pop_back();
      i += 1;
      continue;
    }
    if (is_digit(ch) || ch == '%') {
      int num;
      if (ch == '%') {
        if (i + 2 >= n || !is_digit(s[i + 1]) || !is_digit(s[i + 2]))
          throw ChemError{};
        num = (s[i + 1] - '0') * 10 + (s[i + 2] - '0');
        i += 3;
      } else {
        num = ch - '0';
        i += 1;
      }
      if (prev < 0) throw ChemError{};
      auto it = ring.find(num);
      if (it != ring.end()) {
        int a_other = it->second.first;
        int sym_other = it->second.second;
        ring.erase(it);
        int sym = pending != 0 ? pending : sym_other;
        if (pending != 0 && sym_other != 0 && pending != sym_other)
          throw ChemError{};
        make_bond(mol, a_other, prev, sym);
        pending = 0;
      } else {
        ring[num] = {prev, pending};
        pending = 0;
      }
      continue;
    }
    if (ch == '.') {
      if (pending != 0) throw ChemError{};
      prev = -1;
      i += 1;
      continue;
    }
    throw ChemError{};
  }
  if (!stack.empty() || !ring.empty() || pending != 0) throw ChemError{};
  if (mol.num_atoms() == 0) throw ChemError{};
  return mol;
}

// ------------------------------------------------------- ring basis
// mol.py::_cycle_basis (Horton + GF(2) greedy selection)

using Bits = std::array<uint64_t, 4>;  // up to 256 bonds
inline void bits_xor(Bits& a, const Bits& b) {
  for (int i = 0; i < 4; i++) a[i] ^= b[i];
}
inline int bits_msb(const Bits& a) {  // Python int.bit_length()
  for (int i = 3; i >= 0; i--)
    if (a[i]) return i * 64 + 64 - __builtin_clzll(a[i]);
  return 0;
}
inline bool bits_any(const Bits& a) {
  return a[0] | a[1] | a[2] | a[3];
}

int n_components(const Mol& mol) {
  int n = mol.num_atoms(), comp = 0;
  std::vector<char> seen(n, 0);
  std::vector<int> st;
  for (int s = 0; s < n; s++) {
    if (seen[s]) continue;
    comp++;
    st.assign(1, s);
    seen[s] = 1;
    while (!st.empty()) {
      int u = st.back();
      st.pop_back();
      for (int bi : mol.adj[u]) {
        int v = mol.bonds[bi].other(u);
        if (!seen[v]) {
          seen[v] = 1;
          st.push_back(v);
        }
      }
    }
  }
  return comp;
}

void compute_rings(Mol& mol) {
  if (mol.rings_done) return;
  mol.rings_done = true;
  mol.rings.clear();
  int n = mol.num_atoms(), m = (int)mol.bonds.size();
  if (m > 256) throw ChemError{};  // caller falls back to Python
  int dim = m - n + n_components(mol);
  if (dim <= 0) return;

  // BFS parents from every vertex, neighbor order = adj order
  std::vector<std::vector<int>> parents(n), dists(n);
  for (int src = 0; src < n; src++) {
    parents[src].assign(n, -2);  // -2 unreachable, -1 root
    dists[src].assign(n, -1);
    parents[src][src] = -1;
    dists[src][src] = 0;
    std::deque<int> dq{src};
    while (!dq.empty()) {
      int u = dq.front();
      dq.pop_front();
      for (int bi : mol.adj[u]) {
        int v = mol.bonds[bi].other(u);
        if (parents[src][v] == -2) {
          parents[src][v] = u;
          dists[src][v] = dists[src][u] + 1;
          dq.push_back(v);
        }
      }
    }
  }
  auto path = [&](int src, int dst, std::vector<int>& out) {
    if (parents[src][dst] == -2) return false;
    out.clear();
    out.push_back(dst);
    while (out.back() != src) out.push_back(parents[src][out.back()]);
    return true;  // dst..src
  };

  // flat edge index (n is drug-sized; n^2 ints is small)
  std::vector<int> eidx((size_t)n * n, -1);
  for (int bi = 0; bi < m; bi++) {
    const Bond& b = mol.bonds[bi];
    eidx[(size_t)b.a1 * n + b.a2] = bi;
    eidx[(size_t)b.a2 * n + b.a1] = bi;
  }

  struct Cand {
    int len;
    std::vector<int> sorted_atoms;
    std::vector<int> cyc;
  };
  struct VecHash {
    size_t operator()(const std::vector<int>& v) const {
      size_t h = 1469598103934665603ull;
      for (int x : v) {
        h ^= (size_t)x + 0x9e3779b97f4a7c15ull;
        h *= 1099511628211ull;
      }
      return h;
    }
  };
  std::unordered_set<std::vector<int>, VecHash> seen_keys;
  std::vector<Cand> candidates;
  std::vector<int> px, py, mark(n, -1);
  int stamp = 0;
  for (int v = 0; v < n; v++) {
    for (const Bond& b : mol.bonds) {
      int x = b.a1, y = b.a2;
      if (!path(v, x, px) || !path(v, y, py)) continue;
      // disjoint except at v (timestamped mark array, no sets)
      stamp++;
      for (int a : px) mark[a] = stamp;
      bool ok = true;
      int common = 0;
      for (int a : py)
        if (mark[a] == stamp) {
          common++;
          if (a != v) { ok = false; break; }
        }
      if (!ok || common != 1) continue;
      // cyc = px[:-1] + [v] + reversed(py[:-1])
      std::vector<int> cyc(px.begin(), px.end() - 1);
      cyc.push_back(v);
      for (int k = (int)py.size() - 2; k >= 0; k--) cyc.push_back(py[k]);
      if ((int)cyc.size() < 3) continue;
      // simple-cycle check first (cheap) then dedup
      for (size_t k = 0; k < cyc.size(); k++) {
        int a = cyc[k], c = cyc[(k + 1) % cyc.size()];
        if (eidx[(size_t)a * n + c] < 0) { ok = false; break; }
      }
      if (!ok) continue;
      std::vector<int> key(cyc);
      std::sort(key.begin(), key.end());
      if (!seen_keys.insert(key).second) continue;
      candidates.push_back({(int)cyc.size(), std::move(key),
                            std::move(cyc)});
    }
  }
  std::sort(candidates.begin(), candidates.end(),
            [](const Cand& a, const Cand& b) {
              if (a.len != b.len) return a.len < b.len;
              return a.sorted_atoms < b.sorted_atoms;
            });

  std::map<int, Bits> pivots;  // leading-bit -> row
  for (const Cand& c : candidates) {
    Bits vec{0, 0, 0, 0};
    for (size_t k = 0; k < c.cyc.size(); k++) {
      int a = c.cyc[k], d = c.cyc[(k + 1) % c.cyc.size()];
      int bi = eidx[(size_t)a * n + d];
      vec[bi / 64] |= (uint64_t)1 << (bi % 64);
    }
    Bits red = vec;
    while (bits_any(red)) {
      int lb = bits_msb(red);
      auto it = pivots.find(lb);
      if (it != pivots.end()) {
        bits_xor(red, it->second);
      } else {
        pivots[lb] = red;
        mol.rings.push_back(c.cyc);
        break;
      }
    }
    if ((int)mol.rings.size() == dim) break;
  }
  std::stable_sort(mol.rings.begin(), mol.rings.end(),
                   [](const std::vector<int>& a, const std::vector<int>& b) {
                     return a.size() < b.size();
                   });
}

// ---------------------------------------------------------- sanitize
// sanitize.py:50-194 + aromatic.py

const std::vector<int>* pi_target(const std::string& sym, int q,
                                  int* out) {
  const std::vector<int>* v = allowed_valences(sym, q);
  if (v) *out = (*v)[0];
  return v;
}

void kekulize(Mol& mol, const std::set<int>& pi_needed) {
  // adj restricted to pi atoms, candidate order = bond index order
  std::map<int, std::vector<std::pair<int, int>>> adj;
  for (int a : pi_needed) adj[a];
  for (int bi = 0; bi < (int)mol.bonds.size(); bi++) {
    const Bond& b = mol.bonds[bi];
    if (b.aromatic && pi_needed.count(b.a1) && pi_needed.count(b.a2)) {
      adj[b.a1].push_back({b.a2, bi});
      adj[b.a2].push_back({b.a1, bi});
    }
  }
  std::map<int, int> match;  // atom -> bond index

  // backtrack (sanitize.py:166-186): python list slicing semantics
  std::function<bool(std::vector<int>)> backtrack =
      [&](std::vector<int> remaining) -> bool {
    while (!remaining.empty() && match.count(remaining.back()))
      remaining.pop_back();
    if (remaining.empty()) return true;
    // filter unmatched (stable), then stable sort by unmatched-nbr count
    std::vector<int> rem;
    for (int a : remaining)
      if (!match.count(a)) rem.push_back(a);
    std::stable_sort(rem.begin(), rem.end(), [&](int a, int b) {
      int ca = 0, cb = 0;
      for (auto& p : adj[a])
        if (!match.count(p.first)) ca++;
      for (auto& p : adj[b])
        if (!match.count(p.first)) cb++;
      return ca < cb;
    });
    int a = rem[0];
    std::vector<std::pair<int, int>> cands;
    for (auto& p : adj[a])
      if (!match.count(p.first)) cands.push_back(p);
    if (cands.empty()) return false;
    std::vector<int> rest(rem.begin() + 1, rem.end());
    for (auto& [nb, bi] : cands) {
      match[a] = bi;
      match[nb] = bi;
      if (backtrack(rest)) return true;
      match.erase(a);
      match.erase(nb);
    }
    return false;
  };
  std::vector<int> init(pi_needed.begin(), pi_needed.end());
  std::sort(init.begin(), init.end());
  if (!backtrack(init)) throw ChemError{};

  std::set<int> double_bonds;
  for (auto& [a, bi] : match) double_bonds.insert(bi);
  for (int bi = 0; bi < (int)mol.bonds.size(); bi++) {
    Bond& b = mol.bonds[bi];
    if (b.aromatic) b.order2 = double_bonds.count(bi) ? 4 : 2;
  }
}

void perceive_aromaticity(Mol& mol) {
  compute_rings(mol);
  if (mol.rings.empty()) return;
  std::set<int> ring_atoms;
  for (auto& r : mol.rings) ring_atoms.insert(r.begin(), r.end());

  std::vector<std::set<int>> systems;
  std::set<int> seen;
  for (int a : ring_atoms) {
    if (seen.count(a)) continue;
    std::set<int> comp{a};
    std::vector<int> st{a};
    seen.insert(a);
    while (!st.empty()) {
      int u = st.back();
      st.pop_back();
      for (int v : mol.neighbors(u))
        if (ring_atoms.count(v) && !seen.count(v)) {
          seen.insert(v);
          comp.insert(v);
          st.push_back(v);
        }
    }
    systems.push_back(comp);
  }

  for (auto& system : systems) {
    bool all_arom = true, any_arom = false;
    for (int i : system) {
      if (mol.atoms[i].aromatic) any_arom = true;
      else all_arom = false;
    }
    if (all_arom || any_arom) continue;
    int pi = 0;
    bool ok = true;
    for (int i : system) {
      const Atom& a = mol.atoms[i];
      int in_sys_double = 0, any_double = 0;
      for (int bi : mol.adj[i]) {
        const Bond& b = mol.bonds[bi];
        if (b.order2 == 4 && system.count(b.other(i))) in_sys_double++;
        if (b.order2 >= 4) any_double++;
      }
      if (in_sys_double == 1) pi += 1;
      else if (any_double > 0) { ok = false; break; }
      else if ((a.symbol == "N" || a.symbol == "P") && a.charge <= 0)
        pi += 2;
      else if ((a.symbol == "O" || a.symbol == "S") && a.charge == 0)
        pi += 2;
      else if (a.symbol == "C" && a.charge == -1) pi += 2;
      else if (a.symbol == "C" && a.charge == 1) pi += 0;
      else { ok = false; break; }
    }
    if (!ok || pi < 2 || (pi - 2) % 4 != 0) continue;
    std::set<int> sizes;
    for (auto& r : mol.rings) {
      bool sub = true;
      for (int a : r)
        if (!system.count(a)) { sub = false; break; }
      if (sub) sizes.insert((int)r.size());
    }
    if (!sizes.empty()) {
      bool ok567 = true;
      for (int s : sizes)
        if (s != 5 && s != 6 && s != 7) { ok567 = false; break; }
      if (!ok567) continue;
    }
    bool allowed = true;
    for (int i : system) {
      const std::string& s = mol.atoms[i].symbol;
      if (s != "B" && s != "C" && s != "N" && s != "O" && s != "P" &&
          s != "S") { allowed = false; break; }
    }
    if (!allowed) continue;
    for (int i : system) mol.atoms[i].aromatic = true;
    for (Bond& b : mol.bonds) {
      if (system.count(b.a1) && system.count(b.a2)) {
        bool ring_bond = false;
        for (auto& r : mol.rings) {
          std::set<int> rs(r.begin(), r.end());
          if (rs.count(b.a1) && rs.count(b.a2)) { ring_bond = true; break; }
        }
        if (ring_bond) b.aromatic = true;
      }
    }
  }
}

void sanitize(Mol& mol) {
  int n = mol.num_atoms();
  std::vector<int> arom_deg(n, 0), exo_sum2(n, 0), exo_multi2(n, 0);
  for (const Bond& b : mol.bonds) {
    for (int a : {b.a1, b.a2}) {
      if (b.aromatic) arom_deg[a]++;
      else {
        exo_sum2[a] += b.order2;
        exo_multi2[a] += b.order2 - 2;
      }
    }
  }
  std::set<int> pi_needed;
  for (int i = 0; i < n; i++) {
    Atom& atom = mol.atoms[i];
    if (arom_deg[i] > 0 && !atom.aromatic) throw ChemError{};
    if (!atom.aromatic) continue;
    if (arom_deg[i] < 2 || arom_deg[i] > 3) throw ChemError{};
    int sigma2 = arom_deg[i] * 2 + exo_sum2[i];
    if (!atom.in_bracket) {
      int h2;  // doubled h
      if (atom.symbol == "C") {
        if (exo_multi2[i] >= 2) h2 = 8 - sigma2;
        else {
          pi_needed.insert(i);
          h2 = 8 - sigma2 - 2;
        }
      } else if (atom.symbol == "N" || atom.symbol == "P") {
        h2 = 0;
        if (sigma2 == 4) pi_needed.insert(i);
      } else if (atom.symbol == "O" || atom.symbol == "S") {
        h2 = 0;
      } else if (atom.symbol == "B") {
        h2 = 0;
      } else {
        throw ChemError{};
      }
      if (h2 < 0 || h2 % 2 != 0) throw ChemError{};
      atom.n_h = h2 / 2;
    } else {
      atom.n_h = atom.explicit_h > 0 ? atom.explicit_h : 0;
      int target;
      if (!pi_target(atom.symbol, atom.charge, &target)) continue;
      int need2 = target * 2 - (sigma2 + atom.n_h * 2);
      if (need2 == 2) pi_needed.insert(i);
      else if (need2 != 0) throw ChemError{};
    }
  }
  kekulize(mol, pi_needed);

  for (int i = 0; i < n; i++) {
    Atom& atom = mol.atoms[i];
    int bond_sum2 = 0;
    for (int bi : mol.adj[i]) bond_sum2 += mol.bonds[bi].order2;
    if (bond_sum2 % 2 != 0) throw ChemError{};
    int bond_sum = bond_sum2 / 2;
    atom.degree = (int)mol.adj[i].size();
    if (atom.aromatic) {
      // n_h already set
    } else if (atom.in_bracket) {
      atom.n_h = atom.explicit_h > 0 ? atom.explicit_h : 0;
    } else {
      if (atom.charge != 0) throw ChemError{};
      auto it = kDefaultValences.find(atom.symbol);
      if (it == kDefaultValences.end()) throw ChemError{};
      int v = -1;
      for (int cand : it->second)
        if (cand >= bond_sum) { v = cand; break; }
      if (v < 0) throw ChemError{};
      atom.n_h = v - bond_sum;
    }
    int total = bond_sum + atom.n_h;
    const std::vector<int>* vlist = allowed_valences(atom.symbol,
                                                     atom.charge);
    if (vlist) {
      int mx = *std::max_element(vlist->begin(), vlist->end());
      if (total > mx) throw ChemError{};
    }
  }
  perceive_aromaticity(mol);
}

// --------------------------------------------------- canonical ranks
// canonical.py:25-178

// dense code for the base invariant tuple (order-isomorphic to the
// Python tuple sort: symbol string, aromatic, charge, n_h, isotope,
// degree, in_ring — bool<int comparisons match since False<True)
struct BaseInv {
  std::string symbol;
  int aromatic, charge, n_h, isotope, degree, in_ring;
  bool operator<(const BaseInv& o) const {
    if (symbol != o.symbol) return symbol < o.symbol;
    if (aromatic != o.aromatic) return aromatic < o.aromatic;
    if (charge != o.charge) return charge < o.charge;
    if (n_h != o.n_h) return n_h < o.n_h;
    if (isotope != o.isotope) return isotope < o.isotope;
    if (degree != o.degree) return degree < o.degree;
    return in_ring < o.in_ring;
  }
  bool operator==(const BaseInv& o) const {
    return symbol == o.symbol && aromatic == o.aromatic &&
           charge == o.charge && n_h == o.n_h && isotope == o.isotope &&
           degree == o.degree && in_ring == o.in_ring;
  }
};

// distance profile with int codes: sorted multiset of (dist, code)
std::vector<std::vector<std::pair<int, int>>> distance_profiles(
    const Mol& mol, const std::vector<int>& codes) {
  int n = mol.num_atoms();
  std::vector<std::vector<std::pair<int, int>>> out(n);
  std::vector<int> dist(n);
  for (int src = 0; src < n; src++) {
    std::fill(dist.begin(), dist.end(), -1);
    dist[src] = 0;
    std::deque<int> dq{src};
    auto& prof = out[src];
    prof.clear();
    while (!dq.empty()) {
      int u = dq.front();
      dq.pop_front();
      prof.push_back({dist[u], codes[u]});
      for (int v : mol.neighbors(u))
        if (dist[v] < 0) {
          dist[v] = dist[u] + 1;
          dq.push_back(v);
        }
    }
    std::sort(prof.begin(), prof.end());
  }
  return out;
}

// dense-rank a vector of comparable keys (Python: sorted(set); index)
template <typename K>
std::vector<int> dense_ranks(const std::vector<K>& keys) {
  std::vector<K> uniq(keys);
  std::sort(uniq.begin(), uniq.end());
  uniq.erase(std::unique(uniq.begin(), uniq.end()), uniq.end());
  std::vector<int> out(keys.size());
  for (size_t i = 0; i < keys.size(); i++)
    out[i] = (int)(std::lower_bound(uniq.begin(), uniq.end(), keys[i]) -
                   uniq.begin());
  return out;
}

// bond key for refinement: aromatic -> 3 else order2 (1.5 -> 3 too in
// python; both give identical ordering since aromatic bonds have
// order2 in {2,4} but python uses literal 1.5 for aromatic... mapped
// consistently: python key is (rank, 1.5|order). Order-isomorphism:
// python values {1.0, 1.5, 2.0, 3.0, 4.0} map to {2, 3, 4, 6, 8}.
inline int bond_key2(const Bond& b) { return b.aromatic ? 3 : b.order2; }

std::vector<int> refine_ranks(const Mol& mol, std::vector<int> ranks) {
  int n = mol.num_atoms();
  for (int it = 0; it < 2 * n + 2; it++) {
    std::vector<std::pair<int, std::vector<std::pair<int, int>>>> keys(n);
    for (int i = 0; i < n; i++) {
      auto& nb = keys[i].second;
      for (int bi : mol.adj[i])
        nb.push_back({ranks[mol.bonds[bi].other(i)],
                      bond_key2(mol.bonds[bi])});
      std::sort(nb.begin(), nb.end());
      keys[i].first = ranks[i];
    }
    std::vector<int> nr = dense_ranks(keys);
    if (nr == ranks) break;
    ranks = nr;
  }
  return ranks;
}

std::vector<int> partition_ranks(Mol& mol) {
  int n = mol.num_atoms();
  compute_rings(mol);
  std::set<int> ring_atoms;
  for (auto& r : mol.rings) ring_atoms.insert(r.begin(), r.end());
  std::vector<BaseInv> base(n);
  for (int i = 0; i < n; i++) {
    const Atom& a = mol.atoms[i];
    base[i] = {a.symbol, a.aromatic ? 1 : 0, a.charge, a.n_h,
               a.isotope, (int)mol.adj[i].size(),
               ring_atoms.count(i) ? 1 : 0};
  }
  std::vector<int> base_codes = dense_ranks(base);
  auto profiles = distance_profiles(mol, base_codes);
  std::vector<std::pair<int, std::vector<std::pair<int, int>>>> inv(n);
  for (int i = 0; i < n; i++) inv[i] = {base_codes[i], profiles[i]};
  std::vector<int> ranks = refine_ranks(mol, dense_ranks(inv));

  for (int round = 0; round < 3; round++) {
    std::set<int> distinct(ranks.begin(), ranks.end());
    if ((int)distinct.size() == n) break;
    auto prof2 = distance_profiles(mol, ranks);
    std::vector<std::pair<int, std::vector<std::pair<int, int>>>> inv2(n);
    for (int i = 0; i < n; i++) inv2[i] = {ranks[i], prof2[i]};
    std::vector<int> nr = refine_ranks(mol, dense_ranks(inv2));
    if (nr == ranks) break;
    ranks = nr;
  }
  return ranks;
}

// ------------------------------------------------------------ writer
// canonical.py:181-319

bool needs_bracket_idx(const Mol& mol, int i) {
  const Atom& a = mol.atoms[i];
  if (!kDefaultValences.count(a.symbol) || a.symbol == "H") return true;
  if (a.charge != 0 || a.isotope != 0) return true;
  if (a.aromatic && a.symbol != "B" && a.symbol != "C" &&
      a.symbol != "N" && a.symbol != "O" && a.symbol != "P" &&
      a.symbol != "S")
    return true;
  int bond_sum2 = 0;
  for (int bi : mol.adj[i]) {
    const Bond& b = mol.bonds[bi];
    bond_sum2 += b.aromatic ? 2 : b.order2;
  }
  if (a.aromatic) {
    if (a.symbol == "N" && a.n_h > 0) return true;
    return false;
  }
  const auto& vlist = kDefaultValences.at(a.symbol);
  if (bond_sum2 % 2 != 0) return true;
  int bond_sum = bond_sum2 / 2;
  int v = -1;
  for (int cand : vlist)
    if (cand >= bond_sum) { v = cand; break; }
  if (v < 0) return true;
  return (v - bond_sum) != a.n_h;
}

std::string lower(const std::string& s) {
  std::string out = s;
  for (char& c : out) c = (char)std::tolower((unsigned char)c);
  return out;
}

std::string atom_token(const Mol& mol, int i) {
  const Atom& a = mol.atoms[i];
  std::string sym = a.aromatic ? lower(a.symbol) : a.symbol;
  if (!needs_bracket_idx(mol, i)) return sym;
  std::string out = "[";
  if (a.isotope) out += std::to_string(a.isotope);
  out += sym;
  if (a.n_h == 1) out += "H";
  else if (a.n_h > 1) out += "H" + std::to_string(a.n_h);
  if (a.charge == 1) out += "+";
  else if (a.charge == -1) out += "-";
  else if (a.charge > 1) out += "+" + std::to_string(a.charge);
  else if (a.charge < -1) out += "-" + std::to_string(-a.charge);
  out += "]";
  return out;
}

std::string digit_str(int d) {
  if (d < 10) return std::to_string(d);
  char buf[8];
  std::snprintf(buf, sizeof(buf), "%%%02d", d);
  return buf;
}

std::string bond_symbol(const Mol& mol, const Bond& b) {
  if (b.aromatic) return "";
  if (b.order2 == 2) {
    if (mol.atoms[b.a1].aromatic && mol.atoms[b.a2].aromatic) return "-";
    return "";
  }
  switch (b.order2) {
    case 4: return "=";
    case 6: return "#";
    case 8: return "$";
  }
  return "";
}

std::string write_smiles_ranked(const Mol& mol,
                                const std::vector<int>& ranks) {
  int n = mol.num_atoms();
  std::vector<char> visited(n, 0);
  std::set<std::pair<int, int>> tree_edges;

  // pass 1: DFS tree by rank order (recursive, depth <= n)
  std::function<void(int)> dfs_tree = [&](int u) {
    visited[u] = 1;
    std::vector<int> nbrs = mol.neighbors(u);
    std::stable_sort(nbrs.begin(), nbrs.end(),
                     [&](int x, int y) { return ranks[x] < ranks[y]; });
    for (int v : nbrs) {
      if (!visited[v]) {
        tree_edges.insert({std::min(u, v), std::max(u, v)});
        dfs_tree(v);
      }
    }
  };
  std::vector<int> order(n);
  for (int i = 0; i < n; i++) order[i] = i;
  std::stable_sort(order.begin(), order.end(),
                   [&](int x, int y) { return ranks[x] < ranks[y]; });
  std::vector<int> roots;
  for (int i : order)
    if (!visited[i]) {
      roots.push_back(i);
      dfs_tree(i);
    }

  std::map<std::pair<int, int>, int> closure_digit;
  int next_digit = 1;
  std::vector<int> free_digits;
  std::fill(visited.begin(), visited.end(), 0);

  std::function<std::string(int)> write = [&](int u) -> std::string {
    visited[u] = 1;
    std::string token = atom_token(mol, u);
    std::vector<int> nbrs = mol.neighbors(u);
    std::stable_sort(nbrs.begin(), nbrs.end(),
                     [&](int x, int y) { return ranks[x] < ranks[y]; });
    for (int v : nbrs) {
      std::pair<int, int> e{std::min(u, v), std::max(u, v)};
      if (tree_edges.count(e)) continue;
      const Bond* b = mol.get_bond(u, v);
      auto it = closure_digit.find(e);
      if (it == closure_digit.end()) {
        int d;
        if (!free_digits.empty()) {
          d = free_digits.front();
          free_digits.erase(free_digits.begin());
        } else {
          d = next_digit;
        }
        if (d == next_digit) next_digit++;
        closure_digit[e] = d;
        token += bond_symbol(mol, *b) + digit_str(d);
      } else {
        int d = it->second;
        closure_digit.erase(it);
        free_digits.push_back(d);
        std::sort(free_digits.begin(), free_digits.end());
        token += bond_symbol(mol, *b) + digit_str(d);
      }
    }
    std::vector<int> branches;
    for (int v : nbrs) {
      std::pair<int, int> e{std::min(u, v), std::max(u, v)};
      if (tree_edges.count(e) && !visited[v]) branches.push_back(v);
    }
    for (size_t bi = 0; bi < branches.size(); bi++) {
      int v = branches[bi];
      const Bond* b = mol.get_bond(u, v);
      std::string sub = bond_symbol(mol, *b) + write(v);
      if (bi + 1 < branches.size())
        token += "(" + sub + ")";
      else
        token += sub;
    }
    return token;
  };

  std::string out;
  for (size_t r = 0; r < roots.size(); r++) {
    if (!visited[roots[r]]) {
      if (!out.empty()) out += ".";
      out += write(roots[r]);
    }
  }
  return out;
}

std::string write_smiles_canonical(Mol& mol);

// canonical_ranks_complete (canonical.py:142-178)
std::vector<int> canonical_ranks_complete(Mol& mol, int budget = 64) {
  int n = mol.num_atoms();
  std::vector<int> base = partition_ranks(mol);
  {
    std::set<int> s(base.begin(), base.end());
    if ((int)s.size() == n) return base;
  }
  int leaves = 0;
  bool have_best = false;
  std::string best_s;
  std::vector<int> best_ranks;

  std::function<void(std::vector<int>)> descend =
      [&](std::vector<int> ranks) {
        if (leaves >= budget) return;
        std::set<int> s(ranks.begin(), ranks.end());
        if ((int)s.size() == n) {
          leaves++;
          std::string sm = write_smiles_ranked(mol, ranks);
          if (!have_best || sm < best_s) {
            have_best = true;
            best_s = sm;
            best_ranks = ranks;
          }
          return;
        }
        // first tied class by rank value; members ascending index
        std::map<int, std::vector<int>> seen;
        for (int i = 0; i < n; i++) seen[ranks[i]].push_back(i);
        const std::vector<int>* tied = nullptr;
        for (auto& [r, v] : seen)
          if (v.size() > 1) { tied = &v; break; }
        for (int choice : *tied) {
          std::vector<int> boosted(ranks);
          for (int& r : boosted) r *= 2;
          boosted[choice] -= 1;
          descend(refine_ranks(mol, boosted));
        }
      };
  descend(base);
  if (!have_best) return base;
  return best_ranks;
}

std::string write_smiles_canonical(Mol& mol) {
  return write_smiles_ranked(mol, canonical_ranks_complete(mol));
}

// ---------------------------------------------------------- scaffold
// scaffold.py:19-89

// returns false when acyclic (empty scaffold)
bool prune_to_scaffold(Mol& mol, std::set<int>& keep) {
  int n = mol.num_atoms();
  compute_rings(mol);
  std::set<int> ring_atoms;
  for (auto& r : mol.rings) ring_atoms.insert(r.begin(), r.end());
  if (ring_atoms.empty()) return false;
  for (int i = 0; i < n; i++) keep.insert(i);
  bool changed = true;
  while (changed) {
    changed = false;
    std::vector<int> cur(keep.begin(), keep.end());
    for (int i : cur) {
      if (ring_atoms.count(i)) continue;
      if (!keep.count(i)) continue;
      int deg = 0;
      for (int v : mol.neighbors(i))
        if (keep.count(v)) deg++;
      if (deg <= 1) {
        keep.erase(i);
        changed = true;
      }
    }
  }
  for (const Bond& b : mol.bonds) {
    if (b.order2 >= 4 && !b.aromatic) {
      if (keep.count(b.a1) && !keep.count(b.a2)) keep.insert(b.a2);
      else if (keep.count(b.a2) && !keep.count(b.a1)) keep.insert(b.a1);
    }
  }
  return true;
}

Mol subgraph(const Mol& mol, const std::set<int>& keep) {
  Mol sub;
  std::map<int, int> remap;
  for (int i : keep) {  // std::set iterates ascending = sorted(keep)
    Atom a = mol.atoms[i];
    int removed2 = 0;
    for (int bi : mol.adj[i]) {
      const Bond& b = mol.bonds[bi];
      if (!keep.count(b.other(i))) removed2 += b.aromatic ? 2 : b.order2;
    }
    a.n_h = a.n_h + removed2 / 2;
    a.explicit_h = a.n_h;
    remap[i] = sub.add_atom(a);
  }
  for (const Bond& b : mol.bonds) {
    if (keep.count(b.a1) && keep.count(b.a2))
      sub.add_bond(remap[b.a1], remap[b.a2], b.order2, b.aromatic, 0);
  }
  return sub;
}

}  // namespace

// ------------------------------------------------------- fingerprints
// chem/fingerprints.py — bit-exact port. The Python hashes
// blake2b(repr(data), digest_size=8) of small tuples; the repr strings
// are reproduced byte-for-byte (value domain: element symbols, bools,
// small ints, uint64 codes, bond orders {1.0,1.5,2.0,3.0,4.0}).

// BLAKE2b (RFC 7693), digest_size=8, no key.
namespace blake2 {
const uint64_t IV[8] = {
    0x6a09e667f3bcc908ULL, 0xbb67ae8584caa73bULL, 0x3c6ef372fe94f82bULL,
    0xa54ff53a5f1d36f1ULL, 0x510e527fade682d1ULL, 0x9b05688c2b3e6c1fULL,
    0x1f83d9abfb41bd6bULL, 0x5be0cd19137e2179ULL};
const uint8_t SIGMA[12][16] = {
    {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
    {14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3},
    {11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4},
    {7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8},
    {9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13},
    {2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9},
    {12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11},
    {13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10},
    {6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5},
    {10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0},
    {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
    {14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3}};

inline uint64_t rotr64(uint64_t x, int n) {
  return (x >> n) | (x << (64 - n));
}

inline void G(uint64_t* v, int a, int b, int c, int d, uint64_t x,
              uint64_t y) {
  v[a] = v[a] + v[b] + x;
  v[d] = rotr64(v[d] ^ v[a], 32);
  v[c] = v[c] + v[d];
  v[b] = rotr64(v[b] ^ v[c], 24);
  v[a] = v[a] + v[b] + y;
  v[d] = rotr64(v[d] ^ v[a], 16);
  v[c] = v[c] + v[d];
  v[b] = rotr64(v[b] ^ v[c], 63);
}

inline void compress(uint64_t* h, const uint8_t* block, uint64_t t,
                     bool last) {
  uint64_t m[16], v[16];
  for (int i = 0; i < 16; i++) {
    uint64_t w = 0;
    for (int j = 7; j >= 0; j--) w = (w << 8) | block[i * 8 + j];
    m[i] = w;
  }
  for (int i = 0; i < 8; i++) v[i] = h[i];
  for (int i = 0; i < 8; i++) v[8 + i] = IV[i];
  v[12] ^= t;           // low counter
  if (last) v[14] = ~v[14];
  for (int r = 0; r < 12; r++) {
    const uint8_t* s = SIGMA[r];
    G(v, 0, 4, 8, 12, m[s[0]], m[s[1]]);
    G(v, 1, 5, 9, 13, m[s[2]], m[s[3]]);
    G(v, 2, 6, 10, 14, m[s[4]], m[s[5]]);
    G(v, 3, 7, 11, 15, m[s[6]], m[s[7]]);
    G(v, 0, 5, 10, 15, m[s[8]], m[s[9]]);
    G(v, 1, 6, 11, 12, m[s[10]], m[s[11]]);
    G(v, 2, 7, 8, 13, m[s[12]], m[s[13]]);
    G(v, 3, 4, 9, 14, m[s[14]], m[s[15]]);
  }
  for (int i = 0; i < 8; i++) h[i] ^= v[i] ^ v[8 + i];
}

// 8-byte digest as uint64 little-endian = h[0] (int.from_bytes(...,
// 'little') in the Python)
uint64_t hash8(const std::string& in) {
  uint64_t h[8];
  std::memcpy(h, IV, sizeof(h));
  h[0] ^= 0x01010008ULL;  // digest_length=8, fanout=1, depth=1
  size_t n = in.size(), off = 0;
  uint8_t block[128];
  // all full blocks except the last block (which may be full)
  while (n - off > 128) {
    std::memcpy(block, in.data() + off, 128);
    off += 128;
    compress(h, block, (uint64_t)off, false);
  }
  size_t rem = n - off;
  std::memset(block, 0, 128);
  if (rem) std::memcpy(block, in.data() + off, rem);
  compress(h, block, (uint64_t)n, true);
  return h[0];
}
}  // namespace blake2

namespace {

const char* order_repr(int order2) {
  switch (order2) {
    case 2: return "1.0";
    case 3: return "1.5";
    case 4: return "2.0";
    case 6: return "3.0";
    case 8: return "4.0";
  }
  return "1.0";
}
// the Python bond key is `1.5 if b.aromatic else b.order`
const char* bond_repr(const Bond& b) {
  return b.aromatic ? "1.5" : order_repr(b.order2);
}
double bond_val(const Bond& b) {
  return b.aromatic ? 1.5 : b.order2 / 2.0;
}

// repr((symbol, charge, n_h, aromatic, degree, isotope))
std::string atom_inv_repr(const Atom& a, int degree) {
  std::string s = "('";
  s += a.symbol;
  s += "', ";
  s += std::to_string(a.charge);
  s += ", ";
  s += std::to_string(a.n_h);
  s += ", ";
  s += a.aromatic ? "True" : "False";
  s += ", ";
  s += std::to_string(degree);
  s += ", ";
  s += std::to_string(a.isotope);
  s += ")";
  return s;
}

void morgan_bits(const Mol& mol, uint8_t* out, int n_bits, int radius) {
  int n = mol.num_atoms();
  std::memset(out, 0, n_bits);
  std::vector<uint64_t> cur(n);
  for (int i = 0; i < n; i++) {
    cur[i] = blake2::hash8(
        atom_inv_repr(mol.atoms[i], (int)mol.adj[i].size()));
    out[cur[i] % n_bits] = 1;
  }
  std::vector<uint64_t> nxt(n);
  for (int r = 0; r < radius; r++) {
    for (int i = 0; i < n; i++) {
      // env = sorted((bond_float, cur[other]) pairs)
      std::vector<std::pair<double, uint64_t>> env;
      for (int bi : mol.adj[i]) {
        const Bond& b = mol.bonds[bi];
        env.push_back({bond_val(b), cur[b.other(i)]});
      }
      std::sort(env.begin(), env.end());
      // repr((cur_i, env_tuple))
      std::string s = "(";
      s += std::to_string(cur[i]);
      s += ", (";
      for (size_t k = 0; k < env.size(); k++) {
        // find the bond repr for this sorted value: reconstruct from
        // the double (restricted domain keeps this exact)
        double o = env[k].first;
        const char* orep = o == 1.0 ? "1.0" : o == 1.5 ? "1.5"
                           : o == 2.0 ? "2.0" : o == 3.0 ? "3.0" : "4.0";
        s += "(";
        s += orep;
        s += ", ";
        s += std::to_string(env[k].second);
        s += ")";
        if (k + 1 < env.size()) s += ", ";
      }
      if (env.size() == 1) s += ",";
      s += "))";
      nxt[i] = blake2::hash8(s);
      out[nxt[i] % n_bits] = 1;
    }
    cur = nxt;
  }
}

// path fingerprint (fingerprints.py:52-85): all simple paths up to
// max_len bonds, canonical direction = min(key, rkey) by Python tuple
// comparison over alternating ('sym', arom) / (order,) elements.
void path_bits(const Mol& mol, uint8_t* out, int n_bits, int max_len) {
  std::memset(out, 0, n_bits);
  int n = mol.num_atoms();
  struct Frame {
    int u;
    std::vector<int> apath;
    std::vector<int> bpath;  // bond indices
  };
  for (int start = 0; start < n; start++) {
    std::vector<Frame> stack{{start, {start}, {}}};
    while (!stack.empty()) {
      Frame fr = std::move(stack.back());
      stack.pop_back();
      if (!fr.bpath.empty()) {
        // forward vs reverse comparison, element-wise:
        // position 2k  -> atom codes (symbol, aromatic)
        // position 2k+1 -> bond order floats
        size_t na = fr.apath.size();
        bool rev_smaller = false;
        for (size_t k = 0; k < 2 * na - 1; k++) {
          int cmp = 0;
          if (k % 2 == 0) {
            const Atom& af = mol.atoms[fr.apath[k / 2]];
            const Atom& ar = mol.atoms[fr.apath[na - 1 - k / 2]];
            cmp = af.symbol.compare(ar.symbol);
            if (cmp == 0)
              cmp = (int)af.aromatic - (int)ar.aromatic;
          } else {
            double bf = bond_val(mol.bonds[fr.bpath[k / 2]]);
            double br = bond_val(
                mol.bonds[fr.bpath[fr.bpath.size() - 1 - k / 2]]);
            cmp = bf < br ? -1 : bf > br ? 1 : 0;
          }
          if (cmp != 0) {
            rev_smaller = cmp > 0;
            break;
          }
        }
        // build repr of the chosen direction
        std::string s = "(";
        for (size_t k = 0; k < 2 * na - 1; k++) {
          if (k) s += ", ";
          if (k % 2 == 0) {
            size_t idx = rev_smaller ? na - 1 - k / 2 : k / 2;
            const Atom& a = mol.atoms[fr.apath[idx]];
            s += "('";
            s += a.symbol;
            s += "', ";
            s += a.aromatic ? "True" : "False";
            s += ")";
          } else {
            size_t idx = rev_smaller ? fr.bpath.size() - 1 - k / 2
                                     : k / 2;
            s += "(";
            s += bond_repr(mol.bonds[fr.bpath[idx]]);
            s += ",)";
          }
        }
        s += ")";
        out[blake2::hash8(s) % n_bits] = 1;
      }
      if ((int)fr.bpath.size() >= max_len) continue;
      for (int bi : mol.adj[fr.u]) {
        int v = mol.bonds[bi].other(fr.u);
        bool seen = false;
        for (int a : fr.apath)
          if (a == v) { seen = true; break; }
        if (seen) continue;
        Frame nf;
        nf.u = v;
        nf.apath = fr.apath;
        nf.apath.push_back(v);
        nf.bpath = fr.bpath;
        nf.bpath.push_back(bi);
        stack.push_back(std::move(nf));
      }
    }
  }
}

}  // namespace

// -------------------------------------------------------------- C API


// ===========================================================================
// descriptors — equivalence port of chem/descriptors.py (logP / tPSA /
// QED and their component counts). The Python module is the oracle
// (tests/test_native_chem.py asserts float equality over a corpus
// sample); reference behavior is RDKit Descriptors via
// Utils/properties.py:33-101.
// ===========================================================================

namespace desc {

inline std::vector<const Bond*> bonds_of(const Mol& mol, int i) {
  std::vector<const Bond*> out;
  out.reserve(mol.adj[i].size());
  for (int bi : mol.adj[i]) out.push_back(&mol.bonds[bi]);
  return out;
}

inline double aw(const std::string& s) {
  static const std::unordered_map<std::string, double> W = {
      {"H", 1.008},  {"B", 10.811},  {"C", 12.011},  {"N", 14.007},
      {"O", 15.999}, {"F", 18.998},  {"Na", 22.990}, {"Mg", 24.305},
      {"Si", 28.086},{"P", 30.974},  {"S", 32.065},  {"Cl", 35.453},
      {"K", 39.098}, {"Ca", 40.078}, {"Br", 79.904}, {"I", 126.904},
      {"Se", 78.971},{"Zn", 65.38},  {"Fe", 55.845}};
  auto it = W.find(s);
  return it == W.end() ? 0.0 : it->second;
}

inline double mw(const Mol& mol) {
  double w = 0.0;
  for (const Atom& a : mol.atoms) w += aw(a.symbol) + a.n_h * 1.008;
  return w;
}

inline int hbd(const Mol& mol) {
  int c = 0;
  for (const Atom& a : mol.atoms)
    if ((a.symbol == "N" || a.symbol == "O") && a.n_h > 0) c++;
  return c;
}

inline bool is_amide_n(const Mol& mol, int i) {
  for (int nb : mol.neighbors(i)) {
    const Atom& a = mol.atoms[nb];
    if (a.symbol == "C" || a.symbol == "S") {
      for (const Bond* b : bonds_of(mol, nb)) {
        const Atom& o = mol.atoms[b->other(nb)];
        if (b->order2 == 4 && o.symbol == "O") return true;
      }
    }
  }
  return false;
}

inline bool has_triple(const Mol& mol, int i) {
  for (const Bond* b : bonds_of(mol, i))
    if (b->order2 == 6) return true;
  return false;
}

inline bool is_amide_c(const Mol& mol, int c_idx) {
  const Atom& a = mol.atoms[c_idx];
  if (a.symbol != "C") return false;
  for (const Bond* b : bonds_of(mol, c_idx))
    if (b->order2 == 4 && mol.atoms[b->other(c_idx)].symbol == "O")
      return true;
  return false;
}

inline std::set<int> ring_bond_set(const Mol& mol) {
  std::set<int> rb;
  for (const auto& ring : mol.rings) {
    int L = (int)ring.size();
    for (int k = 0; k < L; k++) {
      const Bond* b = mol.get_bond(ring[k], ring[(k + 1) % L]);
      if (b) rb.insert((int)(b - &mol.bonds[0]));
    }
  }
  return rb;
}

inline int rbn(const Mol& mol) {
  std::set<int> rb = ring_bond_set(mol);
  int cnt = 0;
  for (int bi = 0; bi < (int)mol.bonds.size(); bi++) {
    const Bond& b = mol.bonds[bi];
    if (b.order2 != 2 || b.aromatic || rb.count(bi)) continue;
    const Atom& a1 = mol.atoms[b.a1];
    const Atom& a2 = mol.atoms[b.a2];
    if ((int)mol.adj[b.a1].size() < 2 || (int)mol.adj[b.a2].size() < 2)
      continue;
    if (has_triple(mol, b.a1) || has_triple(mol, b.a2)) continue;
    if ((a1.symbol == "N" && is_amide_c(mol, b.a2)) ||
        (a2.symbol == "N" && is_amide_c(mol, b.a1)))
      continue;
    cnt++;
  }
  return cnt;
}

inline int arrn(const Mol& mol) {
  int cnt = 0;
  for (const auto& ring : mol.rings) {
    bool all_arom = true;
    for (int a : ring)
      if (!mol.atoms[a].aromatic) { all_arom = false; break; }
    if (all_arom) cnt++;
  }
  return cnt;
}

inline int airn(const Mol& mol) {
  return (int)mol.rings.size() - arrn(mol);
}

inline bool in_three_ring(const Mol& mol, int i) {
  std::vector<int> nbrs = mol.neighbors(i);
  for (size_t x = 0; x < nbrs.size(); x++)
    for (size_t y = x + 1; y < nbrs.size(); y++)
      if (mol.get_bond(nbrs[x], nbrs[y])) return true;
  return false;
}

// key: (is_N, aromatic, charge, nH, n_single, n_double, n_triple,
//       n_aromatic_bonds, in_3ring) -> Angstrom^2 (Ertl 2000 Table 1)
struct TpsaRow {
  char sym; bool arom; int q, h, ns, nd, nt, na; bool r3; double v;
};
static const TpsaRow TPSA_TABLE[] = {
    {'N', false, 0, 0, 3, 0, 0, 0, false, 3.24},
    {'N', false, 0, 0, 1, 1, 0, 0, false, 12.36},
    {'N', false, 0, 0, 0, 0, 1, 0, false, 23.79},
    {'N', false, 0, 0, 1, 2, 0, 0, false, 11.68},
    {'N', false, 0, 0, 0, 1, 1, 0, false, 13.60},
    {'N', false, 0, 0, 3, 0, 0, 0, true, 3.01},
    {'N', false, 0, 1, 2, 0, 0, 0, false, 12.03},
    {'N', false, 0, 1, 2, 0, 0, 0, true, 21.94},
    {'N', false, 0, 1, 0, 1, 0, 0, false, 23.85},
    {'N', false, 0, 2, 1, 0, 0, 0, false, 26.02},
    {'N', false, 1, 0, 4, 0, 0, 0, false, 0.00},
    {'N', false, 1, 0, 2, 1, 0, 0, false, 3.01},
    {'N', false, 1, 0, 1, 0, 1, 0, false, 4.36},
    {'N', false, 1, 1, 3, 0, 0, 0, false, 4.44},
    {'N', false, 1, 1, 1, 1, 0, 0, false, 13.97},
    {'N', false, 1, 2, 2, 0, 0, 0, false, 16.61},
    {'N', false, 1, 2, 0, 1, 0, 0, false, 25.59},
    {'N', false, 1, 3, 1, 0, 0, 0, false, 27.64},
    {'N', true, 0, 0, 0, 0, 0, 2, false, 12.89},
    {'N', true, 0, 0, 0, 0, 0, 3, false, 4.41},
    {'N', true, 0, 0, 1, 0, 0, 2, false, 4.93},
    {'N', true, 0, 0, 0, 1, 0, 2, false, 8.39},
    {'N', true, 0, 1, 0, 0, 0, 2, false, 15.79},
    {'N', true, 1, 0, 0, 0, 0, 3, false, 4.10},
    {'N', true, 1, 0, 1, 0, 0, 2, false, 3.88},
    {'N', true, 1, 1, 0, 0, 0, 2, false, 14.14},
    {'O', false, 0, 0, 2, 0, 0, 0, false, 9.23},
    {'O', false, 0, 0, 2, 0, 0, 0, true, 12.53},
    {'O', false, 0, 0, 0, 1, 0, 0, false, 17.07},
    {'O', false, 0, 1, 1, 0, 0, 0, false, 20.23},
    {'O', false, -1, 0, 1, 0, 0, 0, false, 23.06},
    {'O', true, 0, 0, 0, 0, 0, 2, false, 13.14},
};

inline double tpsa(const Mol& mol) {
  double psa = 0.0;
  for (const Atom& a : mol.atoms) {
    if (a.symbol != "N" && a.symbol != "O") continue;
    int i = (int)(&a - &mol.atoms[0]);
    int na = 0, ns = 0, nd = 0, nt = 0;
    for (const Bond* b : bonds_of(mol, i)) {
      if (b->aromatic) na++;
      else if (b->order2 == 2) ns++;
      else if (b->order2 == 4) nd++;
      else if (b->order2 == 6) nt++;
    }
    bool r3 = in_three_ring(mol, i);
    double contrib = -1.0;
    bool found = false;
    for (const TpsaRow& row : TPSA_TABLE) {
      if (row.sym == a.symbol[0] && row.arom == a.aromatic &&
          row.q == a.charge && row.h == a.n_h && row.ns == ns &&
          row.nd == nd && row.nt == nt && row.na == na && row.r3 == r3) {
        contrib = row.v;
        found = true;
        break;
      }
    }
    if (!found) {
      int x = (int)mol.adj[i].size() + a.n_h;
      if (a.symbol == "N")
        contrib = std::max(0.0, 30.5 - x * 8.2 + a.n_h * 1.5);
      else
        contrib = std::max(0.0, 28.5 - x * 8.6 + a.n_h * 1.5);
    }
    psa += contrib;
  }
  return psa;
}

// --- Wildman-Crippen (1999) typing; constants from the published
// table (same as RDKit Data/Crippen.txt) --------------------------------
inline double crippen_value(const char* t) {
  static const std::unordered_map<std::string, double> V = {
      {"C1", 0.1441},  {"C2", 0.0000},   {"C3", -0.2035}, {"C4", -0.2051},
      {"C5", -0.2783}, {"C6", 0.1551},   {"C7", 0.0017},  {"C8", 0.08452},
      {"C9", -0.1444}, {"C10", -0.0516}, {"C11", 0.1193}, {"C12", -0.0967},
      {"C13", -0.5443},{"C14", 0.0000},  {"C15", 0.2450}, {"C16", 0.1980},
      {"C17", 0.0000}, {"C18", 0.1581},  {"C19", 0.2955}, {"C20", 0.2713},
      {"C21", 0.1360}, {"C22", 0.4619},  {"C23", 0.5437}, {"C24", 0.1893},
      {"C25", -0.8186},{"C26", 0.2640},  {"C27", 0.2148}, {"CS", 0.08129},
      {"H1", 0.1230},  {"H2", -0.2677},  {"H3", 0.2142},  {"H4", 0.2980},
      {"HS", 0.1125},
      {"N1", -1.0190}, {"N2", -0.7096},  {"N3", -1.0270}, {"N4", -0.5188},
      {"N5", 0.08387}, {"N6", 0.1836},   {"N7", -0.3187}, {"N8", -0.4458},
      {"N9", 0.01508}, {"N10", -1.9500}, {"N11", -0.3239},{"N12", -1.1190},
      {"N13", -0.3396},{"N14", 0.2887},  {"NS", -0.4806},
      {"O1", 0.1552},  {"O2", -0.2893},  {"O3", -0.0684}, {"O4", -0.4195},
      {"O5", 0.0335},  {"O6", -0.3339},  {"O7", -1.1890}, {"O8", 0.1788},
      {"O9", -0.1526}, {"O10", 0.1129},  {"O11", 0.4833}, {"O12", -1.3260},
      {"OS", -0.1188},
      {"F", 0.4202},   {"Cl", 0.6895},   {"Br", 0.8456},  {"I", 0.8857},
      {"Hal", -2.9960},{"P", 0.8612},
      {"S1", 0.6482},  {"S2", -0.0024},  {"S3", 0.6237},
      {"Me1", -0.3808},{"Me2", -0.0025}};
  return V.at(t);
}

inline bool c34_hetero(const std::string& s) {
  return s == "N" || s == "O" || s == "P" || s == "S" || s == "F" ||
         s == "Cl" || s == "Br" || s == "I";
}
inline bool normal_elem(const std::string& s) {
  return s == "C" || c34_hetero(s);
}
inline bool me1_elem(const std::string& s) {
  static const std::set<std::string> M = {
      "Li", "Na", "K",  "Rb", "Cs", "Be", "Mg", "Ca", "Sr", "Ba",
      "B",  "Al", "Ga", "In", "Tl", "Si", "Ge", "Sn", "Pb",
      "As", "Sb", "Bi", "Se", "Te", "Po"};
  return M.count(s) > 0;
}

inline const char* type_carbon(const Mol& mol, const Atom& a, int i) {
  std::vector<const Bond*> bonds = bonds_of(mol, i);
  std::vector<const Atom*> nbrs;
  for (int j : mol.neighbors(i)) nbrs.push_back(&mol.atoms[j]);
  int h = a.n_h;

  if (a.aromatic) {
    if (h > 0) return "C18";
    int n_arom_bonds = 0;
    for (const Bond* b : bonds)
      if (b->aromatic) n_arom_bonds++;
    const Atom* sub = nullptr;
    const Bond* sub_bond = nullptr;
    for (const Bond* b : bonds)
      if (!b->aromatic) { sub = &mol.atoms[b->other(i)]; sub_bond = b; }
    if (!sub) return n_arom_bonds >= 3 ? "C19" : "CS";
    if (sub_bond->order2 == 4)
      return (sub->symbol == "C" || sub->symbol == "N" ||
              sub->symbol == "O") ? "C25" : "CS";
    if (!sub->aromatic && !normal_elem(sub->symbol)) return "C13";
    if (sub->symbol == "F" && !sub->aromatic) return "C14";
    if (sub->symbol == "Cl") return "C15";
    if (sub->symbol == "Br") return "C16";
    if (sub->symbol == "I") return "C17";
    if (n_arom_bonds >= 3) return "C19";
    if (sub->aromatic) return "C20";
    if (sub->symbol == "C") return "C21";
    if (sub->symbol == "N") return "C22";
    if (sub->symbol == "O") return "C23";
    if (sub->symbol == "S") return "C24";
    return "CS";
  }

  bool has_double = false, has_trip = false;
  for (const Bond* b : bonds) {
    if (b->order2 == 4) has_double = true;
    if (b->order2 == 6) has_trip = true;
  }

  if (!has_double && !has_trip) {
    bool aliph_het = false, arom_any = false, arom_c = false, weird = false;
    int aliph_c = 0;
    for (const Atom* x : nbrs) {
      if (!x->aromatic && c34_hetero(x->symbol)) aliph_het = true;
      if (!x->aromatic && x->symbol == "C") aliph_c++;
      if (x->aromatic) {
        arom_any = true;
        if (x->symbol == "C") arom_c = true;
      }
      if (!x->aromatic && !normal_elem(x->symbol)) weird = true;
    }
    if (h >= 3) {
      if (nbrs.empty() || aliph_c > 0) return "C1";
      if (aliph_het) return "C3";
      if (arom_c) return "C8";
      if (arom_any) return "C9";
      return weird ? "C27" : "CS";
    }
    if (h == 2) {
      if (aliph_het) return "C3";
      if (aliph_c == (int)nbrs.size()) return "C1";
      if (arom_any) return "C10";
      return weird ? "C27" : "CS";
    }
    if (h == 1) {
      if (aliph_c == (int)nbrs.size()) return "C2";
      if (aliph_het) return "C4";
      if (arom_any) return "C11";
      return weird ? "C27" : "CS";
    }
    if (aliph_c == (int)nbrs.size() && nbrs.size() == 4) return "C2";
    if (aliph_het) return "C4";
    if (arom_any) return "C12";
    return weird ? "C27" : "CS";
  }

  std::vector<const Atom*> dbl_partners;
  for (const Bond* b : bonds)
    if (b->order2 == 4) dbl_partners.push_back(&mol.atoms[b->other(i)]);
  for (const Atom* x : dbl_partners)
    if (!x->aromatic && x->symbol != "C") return "C5";
  if (has_trip) {
    if ((int)nbrs.size() <= 2) {
      for (const Bond* b : bonds)
        if (b->order2 == 6 && !mol.atoms[b->other(i)].aromatic)
          return "C7";
    }
    return "CS";
  }
  bool arom_dbl = false;
  for (const Atom* x : dbl_partners)
    if (x->aromatic) arom_dbl = true;
  std::vector<const Atom*> singles;
  for (const Bond* b : bonds)
    if (b->order2 == 2 && !b->aromatic)
      singles.push_back(&mol.atoms[b->other(i)]);
  if (!arom_dbl) {
    if (dbl_partners.size() == 2) return "C6";
    bool all_aliph = true;
    for (const Atom* x : singles)
      if (x->aromatic) all_aliph = false;
    if (all_aliph) return "C6";
    return "C26";
  }
  return "C26";
}

inline const char* type_nitrogen(const Mol& mol, const Atom& a, int i) {
  std::vector<const Bond*> bonds = bonds_of(mol, i);
  std::vector<const Atom*> nbrs;
  for (int j : mol.neighbors(i)) nbrs.push_back(&mol.atoms[j]);
  int h = a.n_h;
  if (a.aromatic)
    return a.charge > 0 ? "N12" : (a.charge == 0 ? "N11" : "N14");
  if (a.charge < 0) return "N14";
  if (a.charge > 0) {
    for (const Bond* b : bonds) {
      const Atom& o = mol.atoms[b->other(i)];
      if ((b->order2 == 4 || b->order2 == 6) && o.symbol == "N" &&
          o.charge < 0)
        return "N14";
    }
    return h >= 1 ? "N10" : "N13";
  }
  bool has_double = false, has_trip = false;
  for (const Bond* b : bonds) {
    if (b->order2 == 4) has_double = true;
    if (b->order2 == 6) has_trip = true;
  }
  if (has_trip) return "N9";
  if (has_double) return h >= 1 ? "N5" : "N6";
  bool arom_nb = false;
  for (const Atom* x : nbrs)
    if (x->aromatic) arom_nb = true;
  if (h >= 2) return arom_nb ? "N3" : "N1";
  if (h == 1) return arom_nb ? "N4" : "N2";
  if (!nbrs.empty()) return arom_nb ? "N8" : "N7";
  return "NS";
}

inline const char* type_oxygen(const Mol& mol, const Atom& a, int i) {
  std::vector<const Bond*> bonds = bonds_of(mol, i);
  std::vector<const Atom*> nbrs;
  for (int j : mol.neighbors(i)) nbrs.push_back(&mol.atoms[j]);
  if (a.aromatic) return "O1";
  if (a.n_h >= 1) return "O2";
  if (a.charge < 0) {
    for (const Atom* x : nbrs)
      if (x->symbol == "N") return "O5";
    for (const Atom* x : nbrs)
      if (x->symbol == "S") return "O6";
    for (size_t k = 0; k < nbrs.size(); k++) {
      const Atom* x = nbrs[k];
      if (x->symbol == "C") {
        int xi = mol.neighbors(i)[k];
        for (const Bond* b : bonds_of(mol, xi))
          if (b->order2 == 4 && mol.atoms[b->other(xi)].symbol == "O")
            return "O12";
      }
    }
    return "O7";
  }
  const Atom* c = nullptr;
  int ci = -1;
  for (const Bond* b : bonds)
    if (b->order2 == 4 && !c) { ci = b->other(i); c = &mol.atoms[ci]; }
  if (c) {
    if (c->symbol == "N" || c->symbol == "O") return "O5";
    if (c->symbol == "S") return "O6";
    if (c->symbol == "C") {
      if (c->aromatic) return "O8";
      std::vector<const Atom*> others;
      for (int j : mol.neighbors(ci))
        if (j != i) others.push_back(&mol.atoms[j]);
      int n_alc = 0, n_arc = 0, n_aromc = 0;
      for (const Atom* x : others) {
        if (!x->aromatic && x->symbol == "C") n_alc++;
        if (x->aromatic) {
          n_arc++;
          if (x->symbol == "C") n_aromc++;
        }
      }
      int n_anyc = n_alc + n_aromc;
      if (c->n_h > 0 || others.empty()) return n_arc ? "O10" : "O9";
      for (const Bond* b : bonds_of(mol, ci))
        if (b->order2 == 4 && b->other(ci) != i) return "O9";
      bool all_aliph = true;
      for (const Atom* x : others)
        if (x->aromatic) all_aliph = false;
      if (n_alc >= 1 && all_aliph) return "O9";
      if (n_anyc >= 1) return "O10";
      return "O11";
    }
    return "OS";
  }
  if (!nbrs.empty()) {
    bool any_arom = false;
    for (const Atom* x : nbrs)
      if (x->aromatic) any_arom = true;
    if (!any_arom && nbrs.size() >= 2) return "O3";
    if (any_arom) return "O4";
  }
  return "OS";
}

inline const char* crippen_atom_type(const Mol& mol, const Atom& a, int i) {
  const std::string& sym = a.symbol;
  if (sym == "C") return type_carbon(mol, a, i);
  if (sym == "N") return type_nitrogen(mol, a, i);
  if (sym == "O") return type_oxygen(mol, a, i);
  if (sym == "S") {
    if (a.aromatic) return "S3";
    bool s2 = a.charge != 0;
    if (!s2)
      for (const Bond* b : bonds_of(mol, i)) {
        const std::string& o = mol.atoms[b->other(i)].symbol;
        if (b->order2 == 4 &&
            (o == "N" || o == "O" || o == "P" || o == "S"))
          s2 = true;
      }
    return s2 ? "S2" : "S1";
  }
  if (sym == "P") return "P";
  if (sym == "F" || sym == "Cl" || sym == "Br" || sym == "I")
    return a.charge == 0 ? sym.c_str() : "Hal";
  if (me1_elem(sym)) return "Me1";
  return "Me2";
}

inline const char* crippen_h_type(const Mol& mol, const Atom& a, int i) {
  const std::string& sym = a.symbol;
  if (sym == "C") return "H1";
  if (sym == "N") return "H3";
  if (sym == "O") {
    std::vector<int> nj = mol.neighbors(i);
    for (int j : nj)
      if (mol.atoms[j].symbol == "N") return "H3";
    for (int j : nj) {
      const Atom& x = mol.atoms[j];
      if (x.symbol == "C" && !x.aromatic) {
        for (const Bond* b : bonds_of(mol, j)) {
          const std::string& o = mol.atoms[b->other(j)].symbol;
          if (b->order2 == 4 && !b->aromatic &&
              (o == "C" || o == "N" || o == "O" || o == "S"))
            return "H4";
        }
      }
    }
    for (int j : nj) {
      const std::string& o = mol.atoms[j].symbol;
      if (o == "O" || o == "S") return "H4";
    }
    if (!nj.empty()) return "H2";
    return "HS";
  }
  return "H2";
}

inline double logp(const Mol& mol) {
  double total = 0.0;
  for (int i = 0; i < mol.num_atoms(); i++) {
    const Atom& a = mol.atoms[i];
    // F/Cl/Br/I type names equal the symbol: crippen_atom_type may
    // return sym.c_str(), valid for the lifetime of this call
    total += crippen_value(crippen_atom_type(mol, a, i));
    if (a.n_h)
      total += a.n_h * crippen_value(crippen_h_type(mol, a, i));
  }
  return total;
}

// --- QED (Bickerton 2012) ----------------------------------------------
inline int qed_hba(const Mol& mol) {
  int cnt = 0;
  for (int i = 0; i < mol.num_atoms(); i++) {
    const Atom& a = mol.atoms[i];
    std::vector<const Bond*> bonds = bonds_of(mol, i);
    if (a.symbol == "O") {
      if (a.aromatic) {
        if (a.n_h == 0) cnt++;
      } else if (a.charge == 0) {
        cnt++;
      } else if (a.charge < 0 && mol.adj[i].size() <= 1) {
        cnt++;
      }
    } else if (a.symbol == "S" && !a.aromatic) {
      bool all_single = true, any_ge2 = false;
      for (const Bond* b : bonds) {
        if (b->order2 != 2) all_single = false;
        if (b->order2 >= 4) any_ge2 = true;
      }
      if (a.n_h == 0 && a.charge == 0 && all_single &&
          bonds.size() <= 2 && !any_ge2 && bonds.size() == 2)
        cnt++;
      if (a.n_h == 0 && a.charge == 0 && bonds.size() == 1 &&
          bonds[0]->order2 == 4)
        cnt++;
      if (a.charge < 0 && bonds.size() <= 1) cnt++;
    } else if (a.symbol == "N") {
      if (a.aromatic) {
        if (a.n_h == 0 && mol.adj[i].size() == 2) cnt++;
      } else if (a.charge == 0) {
        bool any_triple = false, all_single = true;
        for (const Bond* b : bonds) {
          if (b->order2 == 6) any_triple = true;
          if (b->order2 != 2) all_single = false;
        }
        if (any_triple)
          cnt++;
        else if (all_single && (int)bonds.size() + a.n_h == 3 &&
                 !is_amide_n(mol, i))
          cnt++;
      }
    }
  }
  return cnt;
}

inline int n_alerts(const Mol& mol) {
  int cnt = 0;
  bool azo = false, nitro = false, aldehyde = false, thiol = false,
       peroxide = false, disulfide = false, alkyne = false,
       hydrazine = false, alkyl_halide = false;
  for (int i = 0; i < mol.num_atoms(); i++) {
    const Atom& a = mol.atoms[i];
    std::vector<const Bond*> bonds = bonds_of(mol, i);
    if (a.symbol == "N" && !a.aromatic) {
      for (const Bond* b : bonds) {
        const Atom& o = mol.atoms[b->other(i)];
        if (b->order2 == 4 && o.symbol == "N" && !o.aromatic) azo = true;
      }
    }
    if (a.symbol == "N" && a.charge == 1) {
      for (const Bond* b : bonds)
        if (b->order2 == 4 && mol.atoms[b->other(i)].symbol == "O")
          nitro = true;
    }
    if (a.symbol == "C" && !a.aromatic && a.n_h >= 1) {
      for (const Bond* b : bonds)
        if (b->order2 == 4 && mol.atoms[b->other(i)].symbol == "O")
          aldehyde = true;
    }
    if (a.symbol == "S" && a.n_h > 0) thiol = true;
    if (a.symbol == "C" && !a.aromatic) {
      bool all_single = true, any_hal = false;
      for (const Bond* b : bonds) {
        if (b->order2 != 2) all_single = false;
        const std::string& o = mol.atoms[b->other(i)].symbol;
        if (o == "Cl" || o == "Br" || o == "I") any_hal = true;
      }
      if (all_single && any_hal) alkyl_halide = true;
    }
  }
  for (const Bond& b : mol.bonds) {
    const Atom& x = mol.atoms[b.a1];
    const Atom& y = mol.atoms[b.a2];
    if (b.order2 == 2 && !b.aromatic) {
      if (x.symbol == "O" && y.symbol == "O") peroxide = true;
      if (x.symbol == "S" && y.symbol == "S") disulfide = true;
      if (x.symbol == "N" && y.symbol == "N" && !x.aromatic &&
          !y.aromatic)
        hydrazine = true;
    }
    if (b.order2 == 6 && x.symbol == "C" && y.symbol == "C")
      alkyne = true;
  }
  cnt = (int)azo + nitro + aldehyde + thiol + peroxide + disulfide +
        alkyne + hydrazine + alkyl_halide;
  return cnt;
}

struct AdsParams { double a, b, c, d, e, f, dmax; };
inline double ads(double x, const AdsParams& p) {
  return (p.a + (p.b / (1 + std::exp(-(x - p.c + p.d / 2) / p.e)) *
                 (1 - 1 / (1 + std::exp(-(x - p.c - p.d / 2) / p.f))))) /
         p.dmax;
}

inline double qed(const Mol& mol) {
  static const AdsParams P_MW{2.817065973, 392.5754953, 290.7489764,
                              2.419764353, 49.22325677, 65.37051707,
                              104.9805561};
  static const AdsParams P_ALOGP{3.172690585, 137.8624751, 2.534937431,
                                 4.581497897, 0.822739154, 0.576295591,
                                 131.3186604};
  static const AdsParams P_HBA{2.948620388, 160.4605972, 3.615294657,
                               4.435986202, 0.290141953, 1.300669958,
                               148.7763046};
  static const AdsParams P_HBD{1.618662227, 1010.051101, 0.985094388,
                               0.000000001, 0.713820843, 0.920922555,
                               258.1632616};
  static const AdsParams P_PSA{1.876861559, 125.2232657, 62.90773554,
                               87.83366614, 12.01999824, 28.51324732,
                               104.5686167};
  static const AdsParams P_ROTB{0.010000000, 272.4121427, 2.558379970,
                                1.565547684, 1.271567166, 2.758063707,
                                105.4420403};
  static const AdsParams P_AROM{3.217788970, 957.7374108, 2.274627939,
                                0.000000001, 1.317690384, 0.375760881,
                                312.3372610};
  static const AdsParams P_ALERTS{0.010000000, 1199.094025, -0.09002883,
                                  0.000000001, 0.185904477, 0.875193782,
                                  417.7253140};
  const double vals[8] = {
      mw(mol),           logp(mol),         (double)qed_hba(mol),
      (double)hbd(mol),  tpsa(mol),         (double)rbn(mol),
      (double)arrn(mol), (double)n_alerts(mol)};
  const AdsParams* ps[8] = {&P_MW,  &P_ALOGP, &P_HBA,  &P_HBD,
                            &P_PSA, &P_ROTB,  &P_AROM, &P_ALERTS};
  const double w[8] = {0.66, 0.46, 0.05, 0.61, 0.06, 0.65, 0.48, 0.95};
  double s = 0.0, wsum = 0.0;
  for (int k = 0; k < 8; k++) {
    double d = std::max(1e-9, ads(vals[k], *ps[k]));
    s += w[k] * std::log(d);
    wsum += w[k];
  }
  return std::exp(s / wsum);
}

}  // namespace desc

extern "C" {

// returns: length written (>=0), -1 invalid, -2 fall back to Python
// (too large for the native bitset path)
int gct_chem_canonical(const char* smiles, char* out, int out_cap) {
  try {
    Mol mol = parse_smiles(smiles ? smiles : "");
    if ((int)mol.bonds.size() > 256 || mol.num_atoms() > 512) return -2;
    sanitize(mol);
    std::string s = write_smiles_canonical(mol);
    if ((int)s.size() + 1 > out_cap) return -2;
    std::memcpy(out, s.c_str(), s.size() + 1);
    return (int)s.size();
  } catch (...) {
    return -1;
  }
}

int gct_chem_is_valid(const char* smiles) {
  try {
    Mol mol = parse_smiles(smiles ? smiles : "");
    if ((int)mol.bonds.size() > 256 || mol.num_atoms() > 512) return -2;
    sanitize(mol);
    return 1;
  } catch (...) {
    return 0;
  }
}

// returns: length written (0 = acyclic empty scaffold), -1 invalid,
// -2 fall back to Python
int gct_chem_murcko(const char* smiles, char* out, int out_cap) {
  try {
    Mol mol = parse_smiles(smiles ? smiles : "");
    if ((int)mol.bonds.size() > 256 || mol.num_atoms() > 512) return -2;
    sanitize(mol);
    std::set<int> keep;
    if (!prune_to_scaffold(mol, keep)) {
      if (out_cap < 1) return -2;
      out[0] = '\0';
      return 0;
    }
    Mol sub = subgraph(mol, keep);
    std::string raw = write_smiles_canonical(sub);
    Mol re = parse_smiles(raw);
    if ((int)re.bonds.size() > 256) return -2;
    sanitize(re);
    std::string s = write_smiles_canonical(re);
    if ((int)s.size() + 1 > out_cap) return -2;
    std::memcpy(out, s.c_str(), s.size() + 1);
    return (int)s.size();
  } catch (...) {
    return -1;
  }
}

// Parse+sanitize and EXPORT the molecular graph so the Python side
// can run descriptor math on it without the (dominant) Python parse.
// Layout (int32): [n_atoms, n_bonds, n_rings, ring_total,
//   atoms: n_atoms x 10 (sym_c1, sym_c2|0, aromatic, charge,
//          explicit_h(-1=None), isotope, in_bracket, n_h, degree,
//          chiral),
//   bonds: n_bonds x 5 (a1, a2, order2, aromatic, stereo),
//   rings: n_rings lengths, then ring_total atom ids]
// returns ints written, -1 invalid, -2 fall back / buffer too small.
int gct_chem_parse(const char* smiles, int32_t* out, int cap) {
  try {
    Mol mol = parse_smiles(smiles ? smiles : "");
    if ((int)mol.bonds.size() > 256 || mol.num_atoms() > 512) return -2;
    sanitize(mol);
    compute_rings(mol);  // descriptors consume ring_info()
    int n = mol.num_atoms(), m = (int)mol.bonds.size();
    int ring_total = 0;
    for (auto& r : mol.rings) ring_total += (int)r.size();
    int need = 4 + n * 10 + m * 5 + (int)mol.rings.size() + ring_total;
    if (need > cap) return -2;
    int32_t* p = out;
    *p++ = n;
    *p++ = m;
    *p++ = (int)mol.rings.size();
    *p++ = ring_total;
    for (const Atom& a : mol.atoms) {
      *p++ = (int32_t)a.symbol[0];
      *p++ = a.symbol.size() > 1 ? (int32_t)a.symbol[1] : 0;
      *p++ = a.aromatic ? 1 : 0;
      *p++ = a.charge;
      *p++ = a.in_bracket ? a.explicit_h : -1;
      *p++ = a.isotope;
      *p++ = a.in_bracket ? 1 : 0;
      *p++ = a.n_h;
      *p++ = a.degree;
      *p++ = a.chiral;
    }
    for (const Bond& b : mol.bonds) {
      *p++ = b.a1;
      *p++ = b.a2;
      *p++ = b.order2;
      *p++ = b.aromatic ? 1 : 0;
      *p++ = b.stereo;
    }
    for (auto& r : mol.rings) *p++ = (int32_t)r.size();
    for (auto& r : mol.rings)
      for (int a : r) *p++ = a;
    return need;
  } catch (...) {
    return -1;
  }
}

// morgan / path fingerprints into a caller uint8 buffer of n_bits.
// returns 1 ok, 0 invalid, -2 fall back to Python
int gct_chem_morgan(const char* smiles, uint8_t* out, int n_bits,
                    int radius) {
  try {
    Mol mol = parse_smiles(smiles ? smiles : "");
    if ((int)mol.bonds.size() > 256 || mol.num_atoms() > 512) return -2;
    sanitize(mol);
    morgan_bits(mol, out, n_bits, radius);
    return 1;
  } catch (...) {
    return 0;
  }
}

int gct_chem_pathfp(const char* smiles, uint8_t* out, int n_bits,
                    int max_len) {
  try {
    Mol mol = parse_smiles(smiles ? smiles : "");
    if ((int)mol.bonds.size() > 256 || mol.num_atoms() > 512) return -2;
    sanitize(mol);
    path_bits(mol, out, n_bits, max_len);
    return 1;
  } catch (...) {
    return 0;
  }
}

// batch canonicalization: in/out are arrays of n pointers; outs[i]
// receives results via a caller-provided flat buffer laid out as
// n fixed-size slots of slot_cap bytes. status[i]: len/-1/-2.
void gct_chem_canonical_batch(const char** in, int n, char* out_flat,
                              int slot_cap, int* status) {
  for (int i = 0; i < n; i++)
    status[i] = gct_chem_canonical(in[i], out_flat + (size_t)i * slot_cap,
                                   slot_cap);
}

void gct_chem_murcko_batch(const char** in, int n, char* out_flat,
                           int slot_cap, int* status) {
  for (int i = 0; i < n; i++)
    status[i] = gct_chem_murcko(in[i], out_flat + (size_t)i * slot_cap,
                                slot_cap);
}


// Batch molecular properties. prop_codes: 0=logP 1=tPSA 2=QED 3=MW
// 4=HBD 5=RBN 6=ARRN 7=AIRN 8=HAC 9=QED_HBA 10=ALERTS.
// out is n x n_props row-major; status[i]: 1 ok, 0 invalid,
// -2 fall back to Python (molecule too large for the native path).
void gct_chem_props_batch(const char** in, int n, const int32_t* prop_codes,
                          int n_props, double* out, int8_t* status) {
  for (int i = 0; i < n; i++) {
    double* row = out + (size_t)i * n_props;
    try {
      Mol mol = parse_smiles(in[i] ? in[i] : "");
      if ((int)mol.bonds.size() > 256 || mol.num_atoms() > 512) {
        status[i] = -2;
        continue;
      }
      sanitize(mol);
      compute_rings(mol);
      for (int k = 0; k < n_props; k++) {
        switch (prop_codes[k]) {
          case 0: row[k] = desc::logp(mol); break;
          case 1: row[k] = desc::tpsa(mol); break;
          case 2: row[k] = desc::qed(mol); break;
          case 3: row[k] = desc::mw(mol); break;
          case 4: row[k] = (double)desc::hbd(mol); break;
          case 5: row[k] = (double)desc::rbn(mol); break;
          case 6: row[k] = (double)desc::arrn(mol); break;
          case 7: row[k] = (double)desc::airn(mol); break;
          case 8: row[k] = (double)mol.num_atoms(); break;
          case 9: row[k] = (double)desc::qed_hba(mol); break;
          case 10: row[k] = (double)desc::n_alerts(mol); break;
          default: row[k] = 0.0; break;
        }
      }
      status[i] = 1;
    } catch (...) {
      status[i] = 0;
    }
  }
}


// One-parse batch analysis (round 4): canonical SMILES, Murcko
// scaffold, Morgan bits, and properties from a SINGLE parse+sanitize
// per input — the eval pipeline previously re-parsed each molecule
// 3-4x across gct_chem_{canonical,murcko,morgan,props}_batch. Any
// output group is skipped when its pointer is NULL. Per-row status:
// 1 ok, 0 invalid, -2 fall back to Python (size limits). Flat string
// buffers hold n slots of *_cap bytes each.
void gct_chem_analyze_batch(const char** in, int n,
                            char* canon_flat, int canon_cap,
                            char* murcko_flat, int murcko_cap,
                            uint8_t* morgan_flat, int morgan_nbits,
                            int morgan_radius,
                            const int32_t* prop_codes, int n_props,
                            double* props, int8_t* status) {
  for (int i = 0; i < n; i++) {
    try {
      Mol mol = parse_smiles(in[i] ? in[i] : "");
      if ((int)mol.bonds.size() > 256 || mol.num_atoms() > 512) {
        status[i] = -2;
        continue;
      }
      sanitize(mol);
      if (canon_flat) {
        std::string c = write_smiles_canonical(mol);
        if ((int)c.size() + 1 > canon_cap) { status[i] = -2; continue; }
        std::memcpy(canon_flat + (size_t)i * canon_cap, c.c_str(),
                    c.size() + 1);
      }
      if (murcko_flat) {
        char* slot = murcko_flat + (size_t)i * murcko_cap;
        std::set<int> keep;
        if (!prune_to_scaffold(mol, keep)) {
          if (murcko_cap < 1) { status[i] = -2; continue; }
          slot[0] = '\0';
        } else {
          Mol sub = subgraph(mol, keep);
          std::string raw = write_smiles_canonical(sub);
          Mol re = parse_smiles(raw);
          if ((int)re.bonds.size() > 256) { status[i] = -2; continue; }
          sanitize(re);
          std::string m = write_smiles_canonical(re);
          if ((int)m.size() + 1 > murcko_cap) { status[i] = -2; continue; }
          std::memcpy(slot, m.c_str(), m.size() + 1);
        }
      }
      if (morgan_flat)
        morgan_bits(mol, morgan_flat + (size_t)i * morgan_nbits,
                    morgan_nbits, morgan_radius);
      if (props) {
        compute_rings(mol);
        double* row = props + (size_t)i * n_props;
        for (int k = 0; k < n_props; k++) {
          switch (prop_codes[k]) {
            case 0: row[k] = desc::logp(mol); break;
            case 1: row[k] = desc::tpsa(mol); break;
            case 2: row[k] = desc::qed(mol); break;
            case 3: row[k] = desc::mw(mol); break;
            case 4: row[k] = (double)desc::hbd(mol); break;
            case 5: row[k] = (double)desc::rbn(mol); break;
            case 6: row[k] = (double)desc::arrn(mol); break;
            case 7: row[k] = (double)desc::airn(mol); break;
            case 8: row[k] = (double)mol.num_atoms(); break;
            case 9: row[k] = (double)desc::qed_hba(mol); break;
            case 10: row[k] = (double)desc::n_alerts(mol); break;
            default: row[k] = 0.0; break;
          }
        }
      }
      status[i] = 1;
    } catch (...) {
      status[i] = 0;
    }
  }
}

}  // extern "C"
