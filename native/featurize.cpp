// Native backbone-geometry featurizer for diffab-tpu.
//
// Computes, in one pass over a structure, what the host-side preprocessing
// needs per residue (mirroring the numpy semantic reference in
// diffab_pytorch_tpu/structure/geometry.py — parity pinned by
// tests/test_native.py):
//
//   * Gram-Schmidt backbone frames (rows are axes; AF2 convention:
//     e1 = unit(C - CA), e2 = unit((N - CA) orthogonalized), e3 = e1 x e2),
//     identity for residues missing any of N/CA/C;
//   * (phi, psi, omega) dihedrals with validity masks, where neighbors
//     must be array-consecutive, same chain, peptide-bonded
//     (|C_i - N_{i+1}| < 2.5 A) and have complete backbones.
//
// This is the hot per-residue loop of the bulk SAbDab preprocessing
// fan-out (cli/preprocess.py); the PDB parser (pdb_parser.cpp) covers the
// text layer, this file the geometry layer.  Intermediates are double for
// a clean float32 parity margin.

#include <cmath>
#include <cstdint>

namespace {

struct V3 {
  double x, y, z;
};

inline V3 sub(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline double dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline V3 cross(V3 a, V3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
          a.x * b.y - a.y * b.x};
}
inline V3 scale(V3 a, double s) { return {a.x * s, a.y * s, a.z * s}; }
inline double norm(V3 a) { return std::sqrt(dot(a, a)); }

// v / max(|v|, 1e-8) — matches geometry._normalize
inline V3 normalize(V3 v) {
  double n = norm(v);
  return scale(v, 1.0 / (n > 1e-8 ? n : 1e-8));
}

inline V3 load(const float* xyz, int residue, int atom, int n_atoms) {
  const float* p = xyz + (static_cast<long>(residue) * n_atoms + atom) * 3;
  return {p[0], p[1], p[2]};
}

// signed dihedral about p1-p2 (praxeolitic formulation, IUPAC sign) —
// matches geometry.dihedral_angle
inline double dihedral(V3 p0, V3 p1, V3 p2, V3 p3) {
  V3 b0 = sub(p0, p1);
  V3 b1 = normalize(sub(p2, p1));
  V3 b2 = sub(p3, p2);
  V3 v = sub(b0, scale(b1, dot(b0, b1)));
  V3 w = sub(b2, scale(b1, dot(b2, b1)));
  double x = dot(v, w);
  double y = dot(cross(b1, v), w);
  return std::atan2(y, x);
}

}  // namespace

extern "C" {

// xyz: (L, A, 3) float32; atom_mask: (L, A) u8; chain_idx: (L,) i32.
// Outputs: orientations (L, 3, 3) f32, dihedrals (L, 3) f32 (phi, psi,
// omega; 0 where invalid), dihedrals_mask (L, 3) u8.  Atom slot order is
// N, CA, C (constants.ATOM).  Returns 0 on success.
int diffab_backbone_geometry(const float* xyz, const uint8_t* atom_mask,
                             const int32_t* chain_idx, int32_t n_residues,
                             int32_t n_atoms, float* orientations,
                             float* dihedrals, uint8_t* dihedrals_mask) {
  if (n_residues < 0 || n_atoms < 3) return 1;
  const long L = n_residues;

  // backbone completeness per residue
  for (long i = 0; i < L; ++i) {
    const uint8_t* m = atom_mask + i * n_atoms;
    bool ok = m[0] && m[1] && m[2];

    float* rot = orientations + i * 9;
    if (ok) {
      V3 n = load(xyz, i, 0, n_atoms);
      V3 ca = load(xyz, i, 1, n_atoms);
      V3 c = load(xyz, i, 2, n_atoms);
      V3 e1 = normalize(sub(c, ca));
      V3 u = sub(n, ca);
      V3 e2 = normalize(sub(u, scale(e1, dot(u, e1))));
      V3 e3 = cross(e1, e2);
      rot[0] = static_cast<float>(e1.x);
      rot[1] = static_cast<float>(e1.y);
      rot[2] = static_cast<float>(e1.z);
      rot[3] = static_cast<float>(e2.x);
      rot[4] = static_cast<float>(e2.y);
      rot[5] = static_cast<float>(e2.z);
      rot[6] = static_cast<float>(e3.x);
      rot[7] = static_cast<float>(e3.y);
      rot[8] = static_cast<float>(e3.z);
    } else {
      for (int k = 0; k < 9; ++k) rot[k] = (k % 4 == 0) ? 1.0f : 0.0f;
    }
  }

  for (long i = 0; i < L; ++i) {
    dihedrals[i * 3 + 0] = 0.0f;
    dihedrals[i * 3 + 1] = 0.0f;
    dihedrals[i * 3 + 2] = 0.0f;
    dihedrals_mask[i * 3 + 0] = 0;
    dihedrals_mask[i * 3 + 1] = 0;
    dihedrals_mask[i * 3 + 2] = 0;
  }

  auto bb_ok = [&](long i) {
    const uint8_t* m = atom_mask + i * n_atoms;
    return m[0] && m[1] && m[2];
  };
  // adjacency between i and i+1: same chain, peptide-bonded, both complete
  auto adjacent = [&](long i) {
    if (i + 1 >= L) return false;
    if (chain_idx[i] != chain_idx[i + 1]) return false;
    if (!bb_ok(i) || !bb_ok(i + 1)) return false;
    V3 c = load(xyz, i, 2, n_atoms);
    V3 n_next = load(xyz, i + 1, 0, n_atoms);
    return norm(sub(c, n_next)) < 2.5;
  };

  for (long i = 0; i < L; ++i) {
    V3 n = load(xyz, i, 0, n_atoms);
    V3 ca = load(xyz, i, 1, n_atoms);
    V3 c = load(xyz, i, 2, n_atoms);
    if (i > 0 && adjacent(i - 1)) {  // phi
      V3 c_prev = load(xyz, i - 1, 2, n_atoms);
      dihedrals[i * 3 + 0] = static_cast<float>(dihedral(c_prev, n, ca, c));
      dihedrals_mask[i * 3 + 0] = 1;
    }
    if (adjacent(i)) {  // psi, omega
      V3 n_next = load(xyz, i + 1, 0, n_atoms);
      V3 ca_next = load(xyz, i + 1, 1, n_atoms);
      dihedrals[i * 3 + 1] = static_cast<float>(dihedral(n, ca, c, n_next));
      dihedrals[i * 3 + 2] = static_cast<float>(dihedral(ca, c, n_next, ca_next));
      dihedrals_mask[i * 3 + 1] = 1;
      dihedrals_mask[i * 3 + 2] = 1;
    }
  }
  return 0;
}

}  // extern "C"
