// Native PDB ATOM-record parser for the diffab-tpu preprocessing pipeline.
//
// Same semantics as the pure-Python reference implementation
// (diffab_pytorch_tpu/structure/pdb.py, which stays the source of truth and
// the fallback): ATOM records plus HETATM MSE (-> MET, SE -> SD), first
// model only, altloc first-occurrence-wins (keeps A for A/B pairs, retains
// B-only atoms), unknown residues -> UNK with backbone slots,
// residues keyed by (chain, resseq, icode) in file order, residues without
// a CA dropped.  Canonical atom-slot tables mirror constants.RESIDUE_ATOMS
// (pinned by tests/test_native.py parity checks against the Python parser).
//
// Exposed as a C ABI for ctypes (no pybind11 in this toolchain).  The
// preprocessing fan-out over ~8,400 SAbDab complexes is an embarrassingly
// parallel host-side workload; end-to-end through the ctypes binding this
// is ~2.5x the Python parser per file (tests/test_native.py measures it).

#include <cstring>
#include <cstdlib>
#include <cstdio>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr int kMaxAtoms = 15;

struct ResidueDef {
  const char* name;
  const char* atoms[kMaxAtoms];
  int n_atoms;
};

// Index order matches constants.AA (alphabetical three-letter, UNK last).
const ResidueDef kResidues[] = {
    {"ALA", {"N", "CA", "C", "O", "CB"}, 5},
    {"ARG", {"N", "CA", "C", "O", "CB", "CG", "CD", "NE", "CZ", "NH1", "NH2"}, 11},
    {"ASN", {"N", "CA", "C", "O", "CB", "CG", "OD1", "ND2"}, 8},
    {"ASP", {"N", "CA", "C", "O", "CB", "CG", "OD1", "OD2"}, 8},
    {"CYS", {"N", "CA", "C", "O", "CB", "SG"}, 6},
    {"GLN", {"N", "CA", "C", "O", "CB", "CG", "CD", "OE1", "NE2"}, 9},
    {"GLU", {"N", "CA", "C", "O", "CB", "CG", "CD", "OE1", "OE2"}, 9},
    {"GLY", {"N", "CA", "C", "O"}, 4},
    {"HIS", {"N", "CA", "C", "O", "CB", "CG", "ND1", "CD2", "CE1", "NE2"}, 10},
    {"ILE", {"N", "CA", "C", "O", "CB", "CG1", "CG2", "CD1"}, 8},
    {"LEU", {"N", "CA", "C", "O", "CB", "CG", "CD1", "CD2"}, 8},
    {"LYS", {"N", "CA", "C", "O", "CB", "CG", "CD", "CE", "NZ"}, 9},
    {"MET", {"N", "CA", "C", "O", "CB", "CG", "SD", "CE"}, 8},
    {"PHE", {"N", "CA", "C", "O", "CB", "CG", "CD1", "CD2", "CE1", "CE2", "CZ"}, 11},
    {"PRO", {"N", "CA", "C", "O", "CB", "CG", "CD"}, 7},
    {"SER", {"N", "CA", "C", "O", "CB", "OG"}, 6},
    {"THR", {"N", "CA", "C", "O", "CB", "OG1", "CG2"}, 7},
    {"TRP", {"N", "CA", "C", "O", "CB", "CG", "CD1", "CD2", "NE1", "CE2",
             "CE3", "CZ2", "CZ3", "CH2"}, 14},
    {"TYR", {"N", "CA", "C", "O", "CB", "CG", "CD1", "CD2", "CE1", "CE2",
             "CZ", "OH"}, 12},
    {"VAL", {"N", "CA", "C", "O", "CB", "CG1", "CG2"}, 7},
};
constexpr int kNumResidues = sizeof(kResidues) / sizeof(kResidues[0]);
constexpr int kUnk = 20;

struct SlotTables {
  // residue index -> (atom name -> slot)
  std::vector<std::unordered_map<std::string, int>> slots;
  std::unordered_map<std::string, int> res_index;
  std::unordered_map<std::string, int> backbone;
  SlotTables() {
    slots.resize(kNumResidues);
    for (int r = 0; r < kNumResidues; ++r) {
      res_index[kResidues[r].name] = r;
      for (int a = 0; a < kResidues[r].n_atoms; ++a)
        slots[r][kResidues[r].atoms[a]] = a;
    }
    backbone = {{"N", 0}, {"CA", 1}, {"C", 2}, {"O", 3}};
  }
};
const SlotTables& tables() {
  static SlotTables t;
  return t;
}

inline std::string strip(const char* s, int len) {
  int b = 0, e = len;
  while (b < e && s[b] == ' ') ++b;
  while (e > b && s[e - 1] == ' ') --e;
  return std::string(s + b, e - b);
}

inline bool parse_float(const char* s, int len, float* out) {
  char buf[16];
  if (len >= (int)sizeof(buf)) return false;
  std::memcpy(buf, s, len);
  buf[len] = 0;
  char* end = nullptr;
  *out = std::strtof(buf, &end);
  return end != buf;
}

struct Res {
  int resseq;
  char icode;
  char chain;
  int aa;  // residue-type index, kUnk for unknown
  float xyz[kMaxAtoms][3];
  unsigned char mask[kMaxAtoms];
};

}  // namespace

extern "C" {

// Parse PDB text into flat per-residue arrays (file order, all chains).
// Returns the number of residues written (<= max_residues), or -1 on
// overflow.  Residues lacking a CA atom are dropped (same as the Python
// parser).  Output buffers are caller-allocated:
//   xyz:       max_residues * 15 * 3 floats
//   atom_mask: max_residues * 15 bytes
//   seq_idx:   max_residues ints (residue-type index; 20 = UNK)
//   resseq:    max_residues ints (author numbering)
//   icode:     max_residues bytes
//   chain:     max_residues bytes (chain letter)
int diffab_parse_pdb(const char* text, long text_len, int max_residues,
                     float* xyz, unsigned char* atom_mask, int* seq_idx,
                     int* resseq, char* icode, char* chain) {
  const SlotTables& t = tables();
  std::vector<Res> out;
  out.reserve(1024);
  // open residue per chain (PDB interleaves chains only at TER boundaries,
  // but be permissive like the Python parser)
  std::unordered_map<char, size_t> open;  // chain -> index in `out`
  std::unordered_map<char, std::pair<int, char>> current;  // chain -> key

  const char* p = text;
  const char* end = text + text_len;
  while (p < end) {
    const char* nl = (const char*)memchr(p, '\n', end - p);
    const char* line = p;
    long len = (nl ? nl - p : end - p);
    p = (nl ? nl + 1 : end);
    if (len < 6) continue;
    if (std::strncmp(line, "ENDMDL", 6) == 0) break;
    bool is_atom = std::strncmp(line, "ATOM  ", 6) == 0;
    bool is_mse = std::strncmp(line, "HETATM", 6) == 0 && len >= 20 &&
                  std::strncmp(line + 17, "MSE", 3) == 0;
    if (!is_atom && !is_mse) continue;
    if (len < 54) continue;
    // altloc: no filter — first occurrence per (residue, atom) wins below
    std::string atom_name = strip(line + 12, 4);
    std::string resname = strip(line + 17, 3);
    if (is_mse) {
      resname = "MET";
      if (atom_name == "SE") atom_name = "SD";
    }
    char ch = line[21];
    int rs;
    {
      char buf[8];
      std::memcpy(buf, line + 22, 4);
      buf[4] = 0;
      char* e2 = nullptr;
      rs = (int)std::strtol(buf, &e2, 10);
      if (e2 == buf) continue;
    }
    char ic = line[26];
    float x, y, z;
    if (!parse_float(line + 30, 8, &x) || !parse_float(line + 38, 8, &y) ||
        !parse_float(line + 46, 8, &z))
      continue;

    auto cur = current.find(ch);
    if (cur == current.end() || cur->second != std::make_pair(rs, ic)) {
      // new residue on this chain
      auto ri = t.res_index.find(resname);
      Res r{};
      r.resseq = rs;
      r.icode = ic;
      r.chain = ch;
      r.aa = (ri == t.res_index.end()) ? kUnk : ri->second;
      std::memset(r.mask, 0, sizeof(r.mask));
      out.push_back(r);
      open[ch] = out.size() - 1;
      current[ch] = {rs, ic};
    }
    Res& r = out[open[ch]];
    const auto& slot_map =
        (r.aa == kUnk) ? t.backbone : t.slots[r.aa];
    auto it = slot_map.find(atom_name);
    if (it == slot_map.end()) continue;
    int slot = it->second;
    if (r.mask[slot]) continue;  // keep first occurrence
    r.xyz[slot][0] = x;
    r.xyz[slot][1] = y;
    r.xyz[slot][2] = z;
    r.mask[slot] = 1;
  }

  int n = 0;
  for (const Res& r : out) {
    if (!r.mask[1]) continue;  // no CA -> drop
    if (n >= max_residues) return -1;
    std::memcpy(xyz + (size_t)n * kMaxAtoms * 3, r.xyz, sizeof(r.xyz));
    std::memcpy(atom_mask + (size_t)n * kMaxAtoms, r.mask, sizeof(r.mask));
    seq_idx[n] = r.aa;
    resseq[n] = r.resseq;
    icode[n] = r.icode;
    chain[n] = r.chain;
    ++n;
  }
  return n;
}

int diffab_native_abi_version() { return 1; }

}  // extern "C"
