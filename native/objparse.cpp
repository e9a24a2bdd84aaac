// Native scene data-loader: fast wavefront-OBJ parsing + spatial sort.
//
// The Python parser (pathtracerpython_tpu/scene/obj.py) is the semantic
// reference — this library reproduces it for well-formed files (v/f
// records only,
// negative indices relative to vertices-so-far, fan triangulation from
// vertex 0, '#' comments, v/vt/vn face tokens keep the vertex index) at
// C++ speed for large meshes. Exposed through ctypes
// (pathtracerpython_tpu/scene/native.py) with automatic fallback to the
// Python parser when the shared library is unavailable.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Parsed {
  std::vector<double> vertices;  // xyz triples
  std::vector<int32_t> faces;    // index triples (0-based)
  std::string error;
};

// Parse one whitespace-separated token starting at p; advances p.
inline const char* next_token(const char* p, const char* end,
                              const char** tok_end) {
  while (p < end && (*p == ' ' || *p == '\t')) ++p;
  const char* q = p;
  while (q < end && *q != ' ' && *q != '\t') ++q;
  *tok_end = q;
  return p;
}

bool parse_buffer(const char* data, size_t len, Parsed* out) {
  const char* p = data;
  const char* end = data + len;
  std::vector<int32_t> face_idx;

  while (p < end) {
    const char* line_end = static_cast<const char*>(
        memchr(p, '\n', static_cast<size_t>(end - p)));
    if (!line_end) line_end = end;

    // comment / whitespace handling as in obj.py strip_comments
    const char* s = p;
    while (s < line_end && (*s == ' ')) ++s;
    const char* e = line_end;
    const char* hash = static_cast<const char*>(
        memchr(s, '#', static_cast<size_t>(line_end - s)));
    if (hash) e = hash;

    if (s < e) {
      const char* tok_end;
      const char* tok = next_token(s, e, &tok_end);
      size_t tok_len = static_cast<size_t>(tok_end - tok);
      if (tok_len == 1 && tok[0] == 'v') {
        double xyz[3] = {0, 0, 0};
        const char* q = tok_end;
        for (int k = 0; k < 3; ++k) {
          const char* te;
          const char* t = next_token(q, e, &te);
          if (t == te) {
            out->error = "short vertex record";
            return false;
          }
          char* endp = nullptr;
          xyz[k] = strtod(t, &endp);
          // Whole token must be numeric. Near-parity with Python float():
          // strtod rejects a few exotic forms float() accepts (e.g. digit
          // underscores "1_0"), so such pathological files error here but
          // parse under the Python fallback. Well-formed meshes agree.
          if (endp != te) {
            out->error = "malformed vertex coordinate";
            return false;
          }
          q = te;
        }
        out->vertices.insert(out->vertices.end(), xyz, xyz + 3);
      } else if (tok_len == 1 && tok[0] == 'f') {
        face_idx.clear();
        const char* q = tok_end;
        while (true) {
          const char* te;
          const char* t = next_token(q, e, &te);
          if (t == te) break;
          // "v/vt/vn" forms: vertex index is the part before '/'
          char* endp = nullptr;
          long idx = strtol(t, &endp, 10);
          if (endp == t || (*endp != '/' && endp != te)) {
            out->error = "malformed face index";
            return false;
          }
          long n_verts = static_cast<long>(out->vertices.size() / 3);
          // python parity: store EXACTLY what obj.py stores (i-1 for
          // positive — so 'f 0' stores -1 — and len+i for negative);
          // numpy wraps values in [-n, -1] at triangle_vertices() time,
          // so those are kept raw here and only truly-unreachable
          // indices are rejected
          long zero_based = idx < 0 ? n_verts + idx : idx - 1;
          if (zero_based < -n_verts || zero_based >= n_verts) {
            out->error = "face index out of range";
            return false;
          }
          face_idx.push_back(static_cast<int32_t>(zero_based));
          q = te;
        }
        // fan triangulation from vertex 0 (obj.py _triangulate)
        for (size_t k = 1; k + 1 < face_idx.size(); ++k) {
          out->faces.push_back(face_idx[0]);
          out->faces.push_back(face_idx[k]);
          out->faces.push_back(face_idx[k + 1]);
        }
      }
      // other records skipped, as in the reference parser
    }
    p = line_end + 1;
  }
  return true;
}

}  // namespace

extern "C" {

// Parses `path`; on success returns 0 and sets *out_verts (xyz doubles,
// caller frees via obj_buffers_free), *n_verts, *out_faces, *n_faces.
// On failure returns nonzero and fills err_buf.
int obj_parse(const char* path, double** out_verts, int64_t* n_verts,
              int32_t** out_faces, int64_t* n_faces, char* err_buf,
              int64_t err_len) {
  FILE* f = fopen(path, "rb");
  if (!f) {
    snprintf(err_buf, static_cast<size_t>(err_len), "cannot open %s", path);
    return 1;
  }
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string buf(static_cast<size_t>(size), '\0');
  size_t got = fread(buf.data(), 1, static_cast<size_t>(size), f);
  fclose(f);
  if (got != static_cast<size_t>(size)) {
    snprintf(err_buf, static_cast<size_t>(err_len), "short read on %s", path);
    return 1;
  }

  Parsed parsed;
  if (!parse_buffer(buf.data(), buf.size(), &parsed)) {
    snprintf(err_buf, static_cast<size_t>(err_len), "%s: %s", path,
             parsed.error.c_str());
    return 1;
  }

  *n_verts = static_cast<int64_t>(parsed.vertices.size() / 3);
  *n_faces = static_cast<int64_t>(parsed.faces.size() / 3);
  *out_verts = static_cast<double*>(
      malloc(parsed.vertices.size() * sizeof(double)));
  *out_faces = static_cast<int32_t*>(
      malloc(parsed.faces.size() * sizeof(int32_t)));
  memcpy(*out_verts, parsed.vertices.data(),
         parsed.vertices.size() * sizeof(double));
  memcpy(*out_faces, parsed.faces.data(),
         parsed.faces.size() * sizeof(int32_t));
  return 0;
}

void obj_buffers_free(double* verts, int32_t* faces) {
  free(verts);
  free(faces);
}

// Morton (Z-order) argsort of 3-D points; writes a permutation into `out`
// (int64, caller-allocated, length n). Mirrors scene/arrays._morton_argsort.
void morton_argsort(const double* points, int64_t n, int64_t* out) {
  struct Entry {
    uint32_t code;
    int64_t idx;
  };
  double lo[3] = {1e300, 1e300, 1e300};
  double hi[3] = {-1e300, -1e300, -1e300};
  for (int64_t i = 0; i < n; ++i) {
    for (int k = 0; k < 3; ++k) {
      double v = points[i * 3 + k];
      if (v < lo[k]) lo[k] = v;
      if (v > hi[k]) hi[k] = v;
    }
  }
  auto spread = [](uint32_t x) {
    x = (x | (x << 16)) & 0x030000FFu;
    x = (x | (x << 8)) & 0x0300F00Fu;
    x = (x | (x << 4)) & 0x030C30C3u;
    x = (x | (x << 2)) & 0x09249249u;
    return x;
  };
  std::vector<Entry> entries(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; ++i) {
    uint32_t q[3];
    for (int k = 0; k < 3; ++k) {
      // identical formula to scene/arrays._morton_argsort: divide by
      // max(span, 1e-12) so degenerate-but-nonzero spans still discriminate
      double span = hi[k] - lo[k];
      double u = (points[i * 3 + k] - lo[k]) / (span > 1e-12 ? span : 1e-12);
      double scaled = u * 1023.0;
      if (scaled < 0) scaled = 0;
      if (scaled > 1023) scaled = 1023;
      q[k] = static_cast<uint32_t>(scaled);
    }
    entries[static_cast<size_t>(i)] = {
        (spread(q[0]) << 2) | (spread(q[1]) << 1) | spread(q[2]), i};
  }
  std::stable_sort(entries.begin(), entries.end(),
                   [](const Entry& a, const Entry& b) {
                     return a.code < b.code;
                   });
  for (int64_t i = 0; i < n; ++i) out[i] = entries[static_cast<size_t>(i)].idx;
}

}  // extern "C"
