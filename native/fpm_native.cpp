// fpm_native — native data-plane components for fuzzypatternmatching_tpu.
//
// TPU-native equivalents of the reference's C++ ingest/construction path
// (reference: include/havoqgt/rmat_edge_generator.hpp:218-261,
// impl/delegate_partitioned_graph.ipp construction pipeline): the R-MAT
// stream generator and the CSR builder (sort + dedupe + reverse-edge index)
// that feed the accelerator kernels. Exposed via a C ABI for ctypes.
//
// Floating-point note: compiled with -ffp-contract=off so the quadrant-walk
// noise arithmetic matches IEEE double semantics exactly — the stream is
// bit-identical to both boost::mt19937+uniform_01 and the NumPy fallback.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

namespace {

// ----------------------------------------------------------- vertex hash
// Jenkins 32/16-bit integer hashes used for vertex scrambling
// (reference: detail/hash.hpp:65-140).

inline uint32_t hash32(uint32_t a) {
  a = (a + 0x7ed55d16u) + (a << 12);
  a = (a ^ 0xc761c23cu) ^ (a >> 19);
  a = (a + 0x165667b1u) + (a << 5);
  a = (a + 0xd3a2646cu) ^ (a << 9);
  a = (a + 0xfd7046c5u) + (a << 3);
  a = (a ^ 0xb55a4f09u) ^ (a >> 16);
  return a;
}

inline uint16_t hash16(uint16_t a) {
  a = static_cast<uint16_t>((a + 0x5d16u) + (a << 6));
  a = static_cast<uint16_t>((a ^ 0xc23cu) ^ (a >> 9));
  a = static_cast<uint16_t>((a + 0x67b1u) + (a << 5));
  a = static_cast<uint16_t>((a + 0x646cu) ^ (a << 7));
  a = static_cast<uint16_t>((a + 0x46c5u) + (a << 3));
  a = static_cast<uint16_t>((a ^ 0x4f09u) ^ (a >> 8));
  return a;
}

inline uint64_t shifted_n_hash32(uint64_t input, int n) {
  uint64_t mask = 0xFFFFFFFFull;
  uint64_t to_hash = (input >> n) & mask;
  to_hash = hash32(static_cast<uint32_t>(to_hash));
  mask <<= n;
  input &= ~mask;
  input |= (to_hash << n) & mask;
  return input;
}

inline uint64_t shifted_n_hash16(uint64_t input, int n) {
  uint64_t mask = 0xFFFFull;
  uint64_t to_hash = (input >> n) & mask;
  to_hash = hash16(static_cast<uint16_t>(to_hash));
  mask <<= n;
  input &= ~mask;
  input |= (to_hash << n) & mask;
  return input;
}

uint64_t hash_nbits(uint64_t input, int n) {
  if (n == 32) {
    return hash32(static_cast<uint32_t>(input));
  }
  if (n > 32) {
    int m = n - 32;
    for (int i = 0; i <= m; ++i) input = shifted_n_hash32(input, i);
    for (int i = m; i >= 0; --i) input = shifted_n_hash32(input, i);
    return input;
  }
  int m = n - 16;  // requires n > 16 (same restriction as the reference)
  for (int i = 0; i <= m; ++i) input = shifted_n_hash16(input, i);
  for (int i = m; i >= 0; --i) input = shifted_n_hash16(input, i);
  return input;
}

}  // namespace

extern "C" {

// R-MAT stream for one rank. out_src/out_dst must hold edge_count entries
// (undirected=0) or 2*edge_count (undirected=1, both directions
// interleaved). std::mt19937(seed) == boost::mt19937(seed); the uniform
// draw is rng()/2^32 as double.
void fpm_rmat_generate(uint64_t seed, uint32_t scale, uint64_t edge_count,
                       double a0, double b0, double c0, double d0,
                       int scramble, int undirected, uint64_t* out_src,
                       uint64_t* out_dst) {
  std::mt19937 rng(static_cast<uint32_t>(seed));
  const double inv = 1.0 / 4294967296.0;  // 2^-32
  for (uint64_t e = 0; e < edge_count; ++e) {
    double a = a0, b = b0, c = c0, d = d0;
    uint64_t u = 0, v = 0;
    uint64_t step = (uint64_t(1) << scale) / 2;
    for (uint32_t j = 0; j < scale; ++j) {
      double p = rng() * inv;
      if (p < a) {
        // quadrant a: no move
      } else if (p < a + b) {
        v += step;
      } else if (p < a + b + c) {
        u += step;
      } else {
        u += step;
        v += step;
      }
      step /= 2;
      a *= 0.9 + 0.2 * (rng() * inv);
      b *= 0.9 + 0.2 * (rng() * inv);
      c *= 0.9 + 0.2 * (rng() * inv);
      d *= 0.9 + 0.2 * (rng() * inv);
      double s = a + b + c + d;
      a /= s;
      b /= s;
      c /= s;
      d = 1.0 - a - b - c;
    }
    if (scramble) {
      u = hash_nbits(u, static_cast<int>(scale));
      v = hash_nbits(v, static_cast<int>(scale));
    }
    if (undirected) {
      out_src[2 * e] = u;
      out_dst[2 * e] = v;
      out_src[2 * e + 1] = v;
      out_dst[2 * e + 1] = u;
    } else {
      out_src[e] = u;
      out_dst[e] = v;
    }
  }
}

// Multi-rank stream (generate_rmat.cpp:202-205 seeding), ranks in parallel.
void fpm_rmat_generate_ranks(uint64_t base_seed, uint32_t scale,
                             uint64_t edges_per_rank, uint32_t n_ranks,
                             double a, double b, double c, double d,
                             int scramble, int undirected, uint64_t* out_src,
                             uint64_t* out_dst) {
  uint64_t stride = undirected ? 2 * edges_per_rank : edges_per_rank;
  unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  std::atomic<uint32_t> next(0);
  auto worker = [&]() {
    for (;;) {
      uint32_t r = next.fetch_add(1);
      if (r >= n_ranks) break;
      fpm_rmat_generate(base_seed + 3ull * r, scale, edges_per_rank, a, b, c,
                        d, scramble, undirected, out_src + r * stride,
                        out_dst + r * stride);
    }
  };
  std::vector<std::thread> ts;
  for (unsigned t = 0; t < std::min(hw, n_ranks); ++t) ts.emplace_back(worker);
  for (auto& t : ts) t.join();
}

// Streaming R-MAT -> per-shard spill files with bounded memory (the
// chunked-construction analog of the reference's two-pass build,
// impl/delegate_partitioned_graph.ipp:398-608). Each rank's stream is
// generated on a worker thread; every directed edge (u, v) is appended as
// the packed key u*V+v to spill file "<dir>/spill_<shard>_<rank>.bin"
// where shard = u / block, through a per-(rank, shard) buffer. Degrees
// accumulate into per-rank arrays merged under a mutex at rank end.
// Returns 0 on success, -1 on I/O failure.
// Streams ranks [rank_lo, rank_hi) of the n_ranks R-MAT stream into
// per-(shard, rank) spill files. A multi-process build passes each
// process a disjoint rank range (delegate_partitioned_graph.ipp:398-608's
// per-rank stream slices); rank_lo=0, rank_hi=n_ranks is the single-host
// build. Seeds/noise depend only on the absolute rank id, so the union of
// the ranges' spill files is byte-identical to one process doing all.
int64_t fpm_rmat_spill_shards(uint64_t base_seed, uint32_t scale,
                              uint64_t edges_per_rank, uint32_t n_ranks,
                              double a0, double b0, double c0, double d0,
                              int scramble, int undirected,
                              uint32_t num_shards, uint64_t block,
                              const char* spill_dir,
                              int64_t* raw_degree /*V, zeroed by caller*/,
                              uint32_t rank_lo, uint32_t rank_hi) {
  const uint64_t V = uint64_t(1) << scale;
  const double inv = 1.0 / 4294967296.0;
  const size_t BUF = size_t(1) << 16;
  std::atomic<uint32_t> next(rank_lo);
  std::atomic<int> failed(0);
  static std::mutex deg_mu;
  if (rank_hi > n_ranks) rank_hi = n_ranks;

  auto worker = [&]() {
    std::vector<int64_t> deg(V, 0);
    std::vector<std::vector<uint64_t>> bufs(num_shards);
    std::vector<FILE*> files(num_shards, nullptr);
    for (auto& b : bufs) b.reserve(BUF);
    char path[4096];
    for (;;) {
      uint32_t r = next.fetch_add(1);
      if (r >= rank_hi) break;
      for (uint32_t s = 0; s < num_shards; ++s) {
        std::snprintf(path, sizeof(path), "%s/spill_%u_%u.bin", spill_dir, s,
                      r);
        files[s] = std::fopen(path, "wb");
        if (!files[s]) {
          failed.store(1);
          break;
        }
      }
      if (failed.load()) break;
      auto emit = [&](uint64_t u, uint64_t v) {
        deg[u]++;
        uint32_t s = static_cast<uint32_t>(u / block);
        auto& b = bufs[s];
        b.push_back(u * V + v);
        if (b.size() >= BUF) {
          if (std::fwrite(b.data(), 8, b.size(), files[s]) != b.size())
            failed.store(1);
          b.clear();
        }
      };
      std::mt19937 rng(static_cast<uint32_t>(base_seed + 3ull * r));
      for (uint64_t e = 0; e < edges_per_rank && !failed.load(); ++e) {
        double a = a0, b = b0, c = c0, d = d0;
        uint64_t u = 0, v = 0;
        uint64_t step = (uint64_t(1) << scale) / 2;
        for (uint32_t j = 0; j < scale; ++j) {
          double p = rng() * inv;
          if (p < a) {
          } else if (p < a + b) {
            v += step;
          } else if (p < a + b + c) {
            u += step;
          } else {
            u += step;
            v += step;
          }
          step /= 2;
          a *= 0.9 + 0.2 * (rng() * inv);
          b *= 0.9 + 0.2 * (rng() * inv);
          c *= 0.9 + 0.2 * (rng() * inv);
          d *= 0.9 + 0.2 * (rng() * inv);
          double s = a + b + c + d;
          a /= s;
          b /= s;
          c /= s;
          d = 1.0 - a - b - c;
        }
        if (scramble) {
          u = hash_nbits(u, static_cast<int>(scale));
          v = hash_nbits(v, static_cast<int>(scale));
        }
        emit(u, v);
        if (undirected) emit(v, u);
      }
      for (uint32_t s = 0; s < num_shards; ++s) {
        if (!files[s]) continue;
        auto& b = bufs[s];
        if (!b.empty() &&
            std::fwrite(b.data(), 8, b.size(), files[s]) != b.size())
          failed.store(1);
        b.clear();
        std::fclose(files[s]);
        files[s] = nullptr;
      }
      {
        std::lock_guard<std::mutex> g(deg_mu);
        for (uint64_t i = 0; i < V; ++i) raw_degree[i] += deg[i];
        std::fill(deg.begin(), deg.end(), 0);
      }
    }
  };
  unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  std::vector<std::thread> ts;
  unsigned nr = rank_hi > rank_lo ? rank_hi - rank_lo : 0;
  for (unsigned t = 0; t < std::min(hw, nr); ++t) ts.emplace_back(worker);
  for (auto& t : ts) t.join();
  return failed.load() ? -1 : 0;
}

// CSR build: dedupe the directed stream, emit row_ptr/cols/rev/raw_degree.
// cols/rev must have capacity n_edges; returns the deduplicated edge count.
// Matches graph/csr.py::from_edges exactly (sorted unique (u,v) pairs,
// reverse-edge index, duplicate-inclusive degrees).
uint64_t fpm_build_csr(const uint64_t* src, const uint64_t* dst,
                       uint64_t n_edges, uint64_t num_vertices,
                       int64_t* row_ptr /*V+1*/, int64_t* cols,
                       int64_t* rev, int64_t* raw_degree /*V*/) {
  const uint64_t v = num_vertices;
  std::memset(raw_degree, 0, v * sizeof(int64_t));
  for (uint64_t i = 0; i < n_edges; ++i) raw_degree[src[i]]++;

  std::vector<uint64_t> keys(n_edges);
  for (uint64_t i = 0; i < n_edges; ++i) keys[i] = src[i] * v + dst[i];
  std::sort(keys.begin(), keys.end());
  keys.erase(std::unique(keys.begin(), keys.end()), keys.end());
  const uint64_t m = keys.size();

  std::memset(row_ptr, 0, (v + 1) * sizeof(int64_t));
  for (uint64_t i = 0; i < m; ++i) {
    uint64_t u = keys[i] / v;
    cols[i] = static_cast<int64_t>(keys[i] % v);
    row_ptr[u + 1]++;
  }
  for (uint64_t i = 0; i < v; ++i) row_ptr[i + 1] += row_ptr[i];

  // reverse-edge index via sort + linear merge (random binary searches are
  // cache-hostile at scale): sort (reverse_key, edge_index) pairs, then walk
  // them against the sorted forward keys.
  std::vector<std::pair<uint64_t, uint64_t>> rpairs(m);
  {
    uint64_t u = 0;
    for (uint64_t i = 0; i < m; ++i) {
      while (static_cast<int64_t>(i) >= row_ptr[u + 1]) ++u;
      rpairs[i] = {static_cast<uint64_t>(cols[i]) * v + u, i};
    }
  }
  std::sort(rpairs.begin(), rpairs.end());
  {
    uint64_t j = 0;
    for (uint64_t i = 0; i < m; ++i) {
      const uint64_t rkey = rpairs[i].first;
      while (j < m && keys[j] < rkey) ++j;
      rev[rpairs[i].second] =
          (j < m && keys[j] == rkey) ? static_cast<int64_t>(j) : -1;
    }
  }
  return m;
}

// Edge-list file ingest (reference: parallel_edge_list_reader.hpp:184-288 —
// first pass sniffs 2 vs 3 columns and counts rows, second pass parses).
// Whitespace-separated decimal int64 columns; blank lines skipped.
// fpm_count_edges returns the row count and writes the column count of the
// first non-blank row to *n_cols (0 if the file is empty / unreadable -1).
int64_t fpm_count_edges(const char* path, int64_t* n_cols) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::vector<char> buf(1 << 22);
  int64_t rows = 0, cols = 0;
  bool in_tok = false, line_has_tok = false;
  int64_t first_line_toks = 0;
  bool counted_first = false;
  size_t got;
  while ((got = std::fread(buf.data(), 1, buf.size(), f)) > 0) {
    for (size_t i = 0; i < got; ++i) {
      const char c = buf[i];
      if (c == '\n') {
        if (line_has_tok) {
          ++rows;
          counted_first = true;
        }
        in_tok = line_has_tok = false;
      } else if (c == ' ' || c == '\t' || c == '\r') {
        in_tok = false;
      } else {
        if (!in_tok && !counted_first) ++first_line_toks;
        in_tok = line_has_tok = true;
      }
    }
  }
  if (line_has_tok) ++rows;  // no trailing newline
  cols = first_line_toks;
  std::fclose(f);
  *n_cols = cols;
  return rows;
}

// Parse the file into preallocated arrays (src/dst sized n_rows; data may
// be null when n_cols < 3). Returns rows parsed (== n_rows on success).
int64_t fpm_read_edge_list(const char* path, int64_t n_rows, int64_t n_cols,
                           int64_t* src, int64_t* dst, int64_t* data) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::vector<char> buf(1 << 22);
  int64_t row = 0, col = 0;
  int64_t val = 0;
  bool in_num = false, neg = false;
  size_t got;
  auto flush_tok = [&]() {
    if (!in_num) return;
    const int64_t x = neg ? -val : val;
    if (row < n_rows) {
      if (col == 0) src[row] = x;
      else if (col == 1) dst[row] = x;
      else if (col == 2 && data) data[row] = x;
    }
    ++col;
    in_num = false;
    neg = false;
    val = 0;
  };
  while ((got = std::fread(buf.data(), 1, buf.size(), f)) > 0) {
    for (size_t i = 0; i < got; ++i) {
      const char c = buf[i];
      if (c >= '0' && c <= '9') {
        val = val * 10 + (c - '0');
        in_num = true;
      } else if (c == '-') {
        neg = true;
        in_num = true;
      } else if (c == '\n') {
        flush_tok();
        if (col > 0) ++row;
        col = 0;
      } else {
        flush_tok();
      }
    }
  }
  flush_tok();
  if (col > 0) ++row;
  std::fclose(f);
  return row;
}

// Post-init alive-set reconstruction (engine/init_recon.py fast path;
// the device-side invariant is documented there): walk the surviving
// rows' CSR ranges and keep each slot whose sender label bitset
// intersects the row's accept mask. Two-phase threaded: per-thread kept
// counts over balanced row spans, then exact-offset fills — output is in
// CSR row-major order (the engines' alive_pairs contract). Returns the
// number of kept slots; out arrays must hold sum of the rows' degrees.
int64_t fpm_recon_pairs(const int64_t* row_ptr, const int64_t* cols,
                        const uint32_t* label_tv, const uint32_t* am,
                        const int64_t* rows, int64_t n_rows,
                        int64_t* out_rows, int64_t* out_cols,
                        int64_t* out_eids) {
  const int nt = (std::thread::hardware_concurrency() > 1 && n_rows > 4096)
                     ? 2
                     : 1;
  // balanced split point by slot volume
  std::vector<int64_t> split(nt + 1, n_rows);
  split[0] = 0;
  if (nt == 2) {
    int64_t total = 0;
    for (int64_t i = 0; i < n_rows; ++i)
      total += row_ptr[rows[i] + 1] - row_ptr[rows[i]];
    int64_t acc = 0, cut = n_rows;
    for (int64_t i = 0; i < n_rows; ++i) {
      acc += row_ptr[rows[i] + 1] - row_ptr[rows[i]];
      if (acc * 2 >= total) {
        cut = i + 1;
        break;
      }
    }
    split[1] = cut;
  }
  std::vector<int64_t> kept(nt, 0);
  auto count_span = [&](int t) {
    int64_t k = 0;
    for (int64_t i = split[t]; i < split[t + 1]; ++i) {
      const uint32_t m = am[i];
      const int64_t lo = row_ptr[rows[i]], hi = row_ptr[rows[i] + 1];
      for (int64_t e = lo; e < hi; ++e) k += (label_tv[cols[e]] & m) != 0;
    }
    kept[t] = k;
  };
  auto fill_span = [&](int t, int64_t off) {
    for (int64_t i = split[t]; i < split[t + 1]; ++i) {
      const int64_t v = rows[i];
      const uint32_t m = am[i];
      const int64_t lo = row_ptr[v], hi = row_ptr[v + 1];
      for (int64_t e = lo; e < hi; ++e) {
        const int64_t u = cols[e];
        if (label_tv[u] & m) {
          out_rows[off] = v;
          out_cols[off] = u;
          out_eids[off] = e;
          ++off;
        }
      }
    }
  };
  if (nt == 2) {
    std::thread c0(count_span, 0);
    count_span(1);
    c0.join();
    std::thread f0(fill_span, 0, 0);
    fill_span(1, kept[0]);
    f0.join();
  } else {
    count_span(0);
    fill_span(0, 0);
  }
  int64_t total_kept = 0;
  for (int t = 0; t < nt; ++t) total_kept += kept[t];
  return total_kept;
}

}  // extern "C"
