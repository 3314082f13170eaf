// Fast edge-list TSV/CSV parser for the data pipeline.
//
// The reference's graph construction iterates pandas rows over the full
// GRNBoost2 TSV (reference dataloader/multiloader.py:256-270) — minutes on
// real cohorts.  This C++ path mmap-reads the file and tokenizes in one
// pass; exposed to Python via a C ABI consumed with ctypes
// (multilevel_gnn_tpu/data/native.py).
//
// Format: header line, then rows "src<TAB>dst<TAB>value".  Comma-separated
// files are auto-detected.  Build: make -C csrc
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

struct EdgeList {
  std::vector<std::string> src;
  std::vector<std::string> dst;
  std::vector<double> val;
};

void* parse_edge_tsv(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string buf;
  buf.resize(size);
  if (size > 0 && fread(&buf[0], 1, size, f) != (size_t)size) {
    fclose(f);
    return nullptr;
  }
  fclose(f);

  auto* out = new EdgeList();
  const char* p = buf.data();
  const char* end = p + buf.size();
  // detect delimiter from the first line
  char delim = '\t';
  for (const char* q = p; q < end && *q != '\n'; ++q) {
    if (*q == '\t') { delim = '\t'; break; }
    if (*q == ',') { delim = ','; }
  }
  // skip header
  while (p < end && *p != '\n') ++p;
  if (p < end) ++p;

  while (p < end) {
    const char* t1 = (const char*)memchr(p, delim, end - p);
    if (!t1) break;
    const char* t2 = (const char*)memchr(t1 + 1, delim, end - (t1 + 1));
    if (!t2) break;
    const char* nl = (const char*)memchr(t2 + 1, '\n', end - (t2 + 1));
    const char* stop = nl ? nl : end;
    const char* vend = stop;
    if (vend > t2 + 1 && vend[-1] == '\r') --vend;
    out->src.emplace_back(p, t1 - p);
    out->dst.emplace_back(t1 + 1, t2 - (t1 + 1));
    out->val.push_back(strtod(std::string(t2 + 1, vend - (t2 + 1)).c_str(),
                              nullptr));
    p = nl ? nl + 1 : end;
  }
  return out;
}

long edge_count(void* h) { return ((EdgeList*)h)->src.size(); }
const char* edge_src(void* h, long i) { return ((EdgeList*)h)->src[i].c_str(); }
const char* edge_dst(void* h, long i) { return ((EdgeList*)h)->dst[i].c_str(); }
double edge_val(void* h, long i) { return ((EdgeList*)h)->val[i]; }
void free_edges(void* h) { delete (EdgeList*)h; }

// ---------------------------------------------------------------- //
// Per-patient dense feature materialization: given a (patients x genes)
// column-major value table and a node map, emit the flattened node-slot
// feature vector (the hot loop of reference predefine_data :949-971).
// Values and output are raw float32 buffers owned by the caller (numpy).
void fill_node_features(const float* values,  // (n_patients, n_cols)
                        long n_patients, long n_cols,
                        const long* col_slot,  // (n_cols,) node-slot per col,
                                               // -1 = skip
                        long n_slots,
                        float* out /* (n_patients, n_slots), pre-zeroed */) {
  for (long p = 0; p < n_patients; ++p) {
    const float* row = values + p * n_cols;
    float* orow = out + p * n_slots;
    for (long c = 0; c < n_cols; ++c) {
      long s = col_slot[c];
      if (s >= 0 && s < n_slots) orow[s] = row[c];
    }
  }
}

}  // extern "C"
