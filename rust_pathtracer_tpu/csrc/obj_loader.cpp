// Native Wavefront OBJ + MTL parser.
//
// Behavioral contract matches ../scene/obj_loader.py (the python
// fallback/oracle), which in turn mirrors the reference's tobj usage
// (obj_model.rs:19-111): fan triangulation; the triangle normal is the
// raw vn array indexed by the face's first vertex's POSITION index
// (obj_model.rs:87-96 — tobj does not re-index with
// single_index=false), gated on the file having any vn line; MTL
// Kd/Ns/Ni/illum only, usemtl bound at the use site with re-declared
// names appending + rebinding (tobj's name map).
//
// Two-phase C ABI for ctypes: open -> counts -> fill -> close.

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <map>
#include <sstream>
#include <string>
#include <vector>

namespace {

struct Mtl {
  float kd[3] = {0.8f, 0.8f, 0.8f};
  float ns = 1.0f;
  float ni = 1.0f;
  int32_t illum = 2;
};

struct ObjData {
  std::vector<double> verts;     // 9 per tri
  std::vector<double> normals;   // 3 per tri (position-indexed vn or 0)
  std::vector<uint8_t> has_n;    // 1 per tri
  std::vector<int32_t> mat_idx;  // 1 per tri, -1 = none
  std::vector<Mtl> mats;         // in declaration order (per mtllib)
};

std::string dir_of(const std::string& path) {
  const auto pos = path.find_last_of("/\\");
  return pos == std::string::npos ? std::string(".") : path.substr(0, pos);
}

// materials keep DECLARATION order (the reference maps every declared
// MTL material, used or not — obj_model.rs:28-50); one (name, Mtl)
// entry per newmtl of THIS file, later duplicate names shadow earlier
// ones within the file
void parse_mtl(const std::string& path,
               std::vector<std::pair<std::string, Mtl>>* out) {
  std::ifstream f(path);
  if (!f) return;
  std::string line, cur;
  std::map<std::string, size_t> local;
  while (std::getline(f, line)) {
    std::istringstream ss(line);
    std::string tag;
    if (!(ss >> tag) || tag[0] == '#') continue;
    if (tag == "newmtl") {
      ss >> cur;
      local[cur] = out->size();
      out->emplace_back(cur, Mtl());
    } else if (!cur.empty()) {
      Mtl& m = (*out)[local[cur]].second;
      if (tag == "Kd") ss >> m.kd[0] >> m.kd[1] >> m.kd[2];
      else if (tag == "Ns") ss >> m.ns;
      else if (tag == "Ni") ss >> m.ni;
      else if (tag == "illum") ss >> m.illum;
    }
  }
}

// "v/vt/vn" -> (vertex idx, normal idx) with negative-index support
void parse_corner(const std::string& spec, int64_t nverts, int64_t nnorms,
                  int64_t* vi, int64_t* ni) {
  *vi = -1;
  *ni = -1;
  const char* s = spec.c_str();
  char* end;
  long v = std::strtol(s, &end, 10);
  *vi = v > 0 ? v - 1 : nverts + v;
  if (*end == '/') {
    const char* p = end + 1;
    // skip vt
    const char* slash2 = std::strchr(p, '/');
    if (slash2 && *(slash2 + 1)) {
      long n = std::strtol(slash2 + 1, &end, 10);
      *ni = n > 0 ? n - 1 : nnorms + n;
    }
  }
}

ObjData* parse_obj(const std::string& path) {
  std::ifstream f(path);
  if (!f) return nullptr;
  auto* out = new ObjData();
  std::vector<double> positions;   // xyz
  std::vector<double> vnormals;    // xyz
  std::vector<int64_t> n_src;      // first-vertex POSITION index per tri
  std::map<std::string, int32_t> mat_ids;
  int32_t current_mat = -1;
  const std::string base = dir_of(path);

  std::string line;
  while (std::getline(f, line)) {
    std::istringstream ss(line);
    std::string tag;
    if (!(ss >> tag) || tag[0] == '#') continue;
    if (tag == "v") {
      double x, y, z;
      ss >> x >> y >> z;
      positions.push_back(x);
      positions.push_back(y);
      positions.push_back(z);
    } else if (tag == "vn") {
      double x, y, z;
      ss >> x >> y >> z;
      vnormals.push_back(x);
      vnormals.push_back(y);
      vnormals.push_back(z);
    } else if (tag == "mtllib") {
      std::string name;
      ss >> name;
      // every declared material appends (tobj pushes per mtllib file);
      // re-declared names REBIND for subsequent usemtl lines while
      // earlier faces keep their old index
      std::vector<std::pair<std::string, Mtl>> defs;
      parse_mtl(base + "/" + name, &defs);
      for (auto& kv : defs) {
        mat_ids[kv.first] = static_cast<int32_t>(out->mats.size());
        out->mats.push_back(kv.second);
      }
    } else if (tag == "usemtl") {
      std::string name;
      ss >> name;
      auto it = mat_ids.find(name);
      current_mat = it != mat_ids.end() ? it->second : -1;
    } else if (tag == "f") {
      std::vector<std::pair<int64_t, int64_t>> corners;
      std::string spec;
      const int64_t nv = static_cast<int64_t>(positions.size() / 3);
      const int64_t nn = static_cast<int64_t>(vnormals.size() / 3);
      while (ss >> spec) {
        int64_t vi, ni;
        parse_corner(spec, nv, nn, &vi, &ni);
        corners.emplace_back(vi, ni);
      }
      for (size_t i = 1; i + 1 < corners.size(); ++i) {
        const int64_t v0 = corners[0].first;
        const int64_t v1 = corners[i].first;
        const int64_t v2 = corners[i + 1].first;
        if (v0 < 0 || v1 < 0 || v2 < 0 || v0 >= nv || v1 >= nv || v2 >= nv)
          continue;
        for (int64_t v : {v0, v1, v2})
          for (int a = 0; a < 3; ++a) out->verts.push_back(positions[3 * v + a]);
        n_src.push_back(v0);
        out->mat_idx.push_back(current_mat);
      }
    }
  }
  // reference normal rule (obj_model.rs:87-96): index the raw vn array
  // with the first vertex's POSITION index, gated on the file having
  // any vn line; the FINAL vn count applies (tobj builds meshes after
  // the whole file is parsed).  Where the reference would panic
  // (position index beyond the vn count) we fall back to the
  // geometric normal (has_n = 0).
  const int64_t nn_final = static_cast<int64_t>(vnormals.size() / 3);
  for (int64_t v0 : n_src) {
    if (nn_final > 0 && v0 < nn_final) {
      out->has_n.push_back(1);
      for (int a = 0; a < 3; ++a) out->normals.push_back(vnormals[3 * v0 + a]);
    } else {
      out->has_n.push_back(0);
      for (int a = 0; a < 3; ++a) out->normals.push_back(0.0);
    }
  }
  return out;
}

}  // namespace

extern "C" {

void* pt_obj_open(const char* path) { return parse_obj(path); }

void pt_obj_counts(void* handle, int64_t* ntris, int64_t* nmats) {
  auto* d = static_cast<ObjData*>(handle);
  *ntris = static_cast<int64_t>(d->mat_idx.size());
  *nmats = static_cast<int64_t>(d->mats.size());
}

void pt_obj_fill(void* handle,
                 double* verts,       // [ntris*9]
                 double* normals,     // [ntris*3]
                 uint8_t* has_normal, // [ntris]
                 int32_t* mat_index,  // [ntris]
                 float* mat_kd,       // [nmats*3]
                 float* mat_ns,       // [nmats]
                 float* mat_ni,       // [nmats]
                 int32_t* mat_illum   // [nmats]
) {
  auto* d = static_cast<ObjData*>(handle);
  std::memcpy(verts, d->verts.data(), d->verts.size() * sizeof(double));
  std::memcpy(normals, d->normals.data(), d->normals.size() * sizeof(double));
  std::memcpy(has_normal, d->has_n.data(), d->has_n.size());
  std::memcpy(mat_index, d->mat_idx.data(), d->mat_idx.size() * sizeof(int32_t));
  for (size_t i = 0; i < d->mats.size(); ++i) {
    for (int a = 0; a < 3; ++a) mat_kd[3 * i + a] = d->mats[i].kd[a];
    mat_ns[i] = d->mats[i].ns;
    mat_ni[i] = d->mats[i].ni;
    mat_illum[i] = d->mats[i].illum;
  }
}

void pt_obj_close(void* handle) { delete static_cast<ObjData*>(handle); }

}  // extern "C"
