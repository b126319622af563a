// HNSW graph index (Malkov & Yashunin 2016) — native C++ core with a C API
// for Python ctypes binding.
//
// Role in the framework: the graph-index path for corpora too large to
// brute-force (the reference's docs claim HNSW though its code builds a
// FLAT Milvus index — README.md:47 vs services/milvus_service.py:33; we
// provide both). Metric is inner product (higher = better), matching the
// store's IP/cosine semantics; internally negated into a distance.
//
// Design notes:
// - deterministic level assignment from a seeded RNG (reproducible level
//   structure even for parallel builds; link order is thread-interleaved)
// - layer>0 degree cap M, layer0 cap 2M; neighbor selection by the
//   simple-closest heuristic
// - flat arrays per node for neighbors (cache-friendly), vectors stored
//   contiguously; distance loop auto-vectorizes under -O3 -march=native
// - lock-free concurrent reads after build; PARALLEL batch construction
//   uses bucketed per-node mutexes around neighbor-list access plus a
//   short serial seed phase (hnswlib-style), with all node storage
//   preallocated before threads start so nothing reallocates underneath
//   a reader

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <memory>
#include <mutex>
#include <queue>
#include <random>
#include <thread>
#include <vector>

namespace {

// Reusable epoch-stamped visited tables: search_layer used to allocate and
// zero an O(N) byte array per query per layer, which is quadratic-ish pain
// at multi-million-row scale. A table is marked by bumping its epoch
// (O(1)); the stamp array is only zeroed on 32-bit wrap. Tables are pooled
// behind a mutex so concurrent readers each get their own.
class VisitedPool {
  public:
    struct Table {
        std::vector<uint32_t> stamps;
        uint32_t epoch = 0;
    };

    std::unique_ptr<Table> acquire(size_t n) {
        std::unique_ptr<Table> t;
        {
            std::lock_guard<std::mutex> g(mu_);
            if (!free_.empty()) {
                t = std::move(free_.back());
                free_.pop_back();
            }
        }
        if (!t) t.reset(new Table);
        if (t->stamps.size() < n) t->stamps.resize(n, 0);
        if (++t->epoch == 0) {  // wrapped: clear once, restart at 1
            std::fill(t->stamps.begin(), t->stamps.end(), 0);
            t->epoch = 1;
        }
        return t;
    }

    void release(std::unique_ptr<Table> t) {
        std::lock_guard<std::mutex> g(mu_);
        free_.push_back(std::move(t));
    }

  private:
    std::mutex mu_;
    std::vector<std::unique_ptr<Table>> free_;
};

// bf16 vector storage (optional): rounds each stored vector to bfloat16
// (round-to-nearest-even), halving graph memory. The distance loop
// decodes on the fly (shift into the fp32 high bits — auto-vectorizes);
// queries stay fp32. Quantization error ~2^-8 per element barely moves
// neighbor selection (recall impact unmeasurable at M>=8); callers that
// need exact scores re-rank the returned candidates against their fp32
// matrix (index/vector_store._search_hnsw does).
static inline float bf16_to_f(uint16_t u) {
    uint32_t x = uint32_t(u) << 16;
    float f;
    std::memcpy(&f, &x, 4);
    return f;
}
static inline uint16_t f_to_bf16(float f) {
    uint32_t x;
    std::memcpy(&x, &f, 4);
    // NaN/Inf: the round-to-nearest-even carry below can ripple a
    // NaN's all-ones payload into the sign bit (0x7FFFFFFF -> -0.0f,
    // a silent zero vector). Keep non-finite values non-finite: NaNs
    // quiet to 0x..C0, infinities truncate exactly.
    if ((x & 0x7F800000u) == 0x7F800000u)
        return uint16_t((x >> 16) | ((x & 0x007FFFFFu) ? 0x0040u : 0u));
    x += 0x7FFFu + ((x >> 16) & 1u);  // round to nearest even
    return uint16_t(x >> 16);
}

struct Candidate {
    float dist;
    int32_t id;
};
struct CloserFirst {
    bool operator()(const Candidate& a, const Candidate& b) const {
        return a.dist > b.dist;  // min-heap by dist
    }
};
struct FartherFirst {
    bool operator()(const Candidate& a, const Candidate& b) const {
        return a.dist < b.dist;  // max-heap by dist
    }
};

class HNSW {
  public:
    HNSW(int dim, int M, int ef_construction, uint64_t seed, bool bf16 = false)
        : dim_(dim),
          M_(M),
          M0_(2 * M),
          efc_(ef_construction),
          bf16_(bf16),
          mult_(1.0 / std::log(double(M))),
          rng_(seed),
          entry_(-1),
          max_level_(-1) {}

    int dim() const { return dim_; }
    int size() const { return int(levels_.size()); }
    bool bf16() const { return bf16_; }

    // negative inner product as distance (IP metric: higher ip = closer)
    float dist(const float* a, const float* b) const {
        float s = 0.f;
        for (int i = 0; i < dim_; ++i) s += a[i] * b[i];
        return -s;
    }
    const float* vec(int32_t id) const { return vectors_.data() + size_t(id) * dim_; }
    const uint16_t* vec16(int32_t id) const {
        return vectors16_.data() + size_t(id) * dim_;
    }

    // fp32 query (or decoded node) against a stored node
    float dist_id(const float* q, int32_t id) const {
        if (!bf16_) return dist(q, vec(id));
        const uint16_t* b = vec16(id);
        float s = 0.f;
        for (int i = 0; i < dim_; ++i) s += q[i] * bf16_to_f(b[i]);
        return -s;
    }

    float dist_nodes(int32_t a, int32_t b) const {
        if (!bf16_) return dist(vec(a), vec(b));
        const uint16_t* x = vec16(a);
        const uint16_t* y = vec16(b);
        float s = 0.f;
        for (int i = 0; i < dim_; ++i) s += bf16_to_f(x[i]) * bf16_to_f(y[i]);
        return -s;
    }

    void decode_node(int32_t id, float* out) const {
        if (!bf16_) {
            std::memcpy(out, vec(id), sizeof(float) * dim_);
            return;
        }
        const uint16_t* b = vec16(id);
        for (int i = 0; i < dim_; ++i) out[i] = bf16_to_f(b[i]);
    }

    // Serial-only: append node storage (vector, level, neighbor slots).
    // Inner lists reserve their degree caps so parallel linking never
    // reallocates a list a concurrent (locked) reader copies from.
    int32_t reserve_node(const float* v) {
        int32_t id = size();
        if (bf16_) {
            for (int i = 0; i < dim_; ++i)
                vectors16_.push_back(f_to_bf16(v[i]));
        } else {
            vectors_.insert(vectors_.end(), v, v + dim_);
        }
        int level = int(-std::log(uniform_(rng_)) * mult_);
        levels_.push_back(level);
        neighbors_.emplace_back();
        auto& nbrs = neighbors_.back();
        nbrs.resize(level + 1);
        for (int l = 0; l <= level; ++l)
            nbrs[l].reserve(((l == 0) ? M0_ : M_) + 1);
        return id;
    }

    std::mutex& node_lock(int32_t id) const {
        return locks_[size_t(id) & (kLockBuckets - 1)];
    }

    // Connect a reserved node into the graph. LOCKED=true is the
    // thread-safe path used by parallel batch builds.
    template <bool LOCKED>
    void link_node(int32_t id) {
        // in bf16 mode the insertion query is the node decoded to fp32
        std::vector<float> vbuf;
        const float* v;
        if (bf16_) {
            vbuf.resize(dim_);
            decode_node(id, vbuf.data());
            v = vbuf.data();
        } else {
            v = vec(id);
        }
        int level = levels_[id];

        int32_t snap_entry;
        int snap_max;
        {
            // consistent (entry, max_level) snapshot
            std::unique_lock<std::mutex> g(entry_mu_, std::defer_lock);
            if (LOCKED) g.lock();
            snap_entry = entry_;
            snap_max = max_level_;
        }
        if (snap_entry < 0) {
            entry_ = id;
            max_level_ = level;
            return;
        }

        int32_t cur = snap_entry;
        float cur_d = dist_id(v, cur);
        std::vector<int32_t> nbr_copy;
        // greedy descend through layers above `level`
        for (int l = snap_max; l > level; --l) {
            bool changed = true;
            while (changed) {
                changed = false;
                const std::vector<int32_t>* nbrs;
                if (LOCKED) {
                    std::lock_guard<std::mutex> g(node_lock(cur));
                    nbr_copy = neighbors_[cur][l];
                    nbrs = &nbr_copy;
                } else {
                    nbrs = &neighbors_[cur][l];
                }
                for (int32_t nb : *nbrs) {
                    float d = dist_id(v, nb);
                    if (d < cur_d) {
                        cur_d = d;
                        cur = nb;
                        changed = true;
                    }
                }
            }
        }
        // insert at each layer <= min(level, snapshot max)
        for (int l = std::min(level, snap_max); l >= 0; --l) {
            auto top = search_layer_impl<LOCKED>(v, cur, efc_, l);
            int cap = (l == 0) ? M0_ : M_;
            std::sort(top.begin(), top.end(),
                      [](const Candidate& a, const Candidate& b) {
                          return a.dist < b.dist;
                      });
            // diversity heuristic (Alg. 4): keep a candidate only if it is
            // closer to the query than to every already-selected neighbor
            auto selected = select_heuristic(top, M_);
            {
                std::unique_lock<std::mutex> g(node_lock(id), std::defer_lock);
                if (LOCKED) g.lock();
                auto& my = neighbors_[id][l];
                // concurrent inserters may already have back-linked into us
                for (const Candidate& s : selected) my.push_back(s.id);
                if (int(my.size()) > cap) prune(id, l, cap);
            }
            for (const Candidate& s : selected) {
                std::unique_lock<std::mutex> g(node_lock(s.id),
                                               std::defer_lock);
                if (LOCKED) g.lock();
                if (l >= int(neighbors_[s.id].size())) continue;
                auto& theirs = neighbors_[s.id][l];
                theirs.push_back(id);
                if (int(theirs.size()) > cap) prune(s.id, l, cap);
            }
            if (!top.empty()) cur = top[0].id;
        }
        if (level > snap_max) {
            std::unique_lock<std::mutex> g(entry_mu_, std::defer_lock);
            if (LOCKED) g.lock();
            if (level > max_level_) {
                max_level_ = level;
                entry_ = id;
            }
        }
    }

    void add(const float* v) { link_node<false>(reserve_node(v)); }

    // Parallel batch build: storage for ALL nodes is reserved serially
    // (deterministic levels), the first `seed` nodes link serially so the
    // upper layers have structure, then worker threads link the rest with
    // bucketed per-node locks.
    void add_batch_parallel(int n, const float* vecs, int nthreads) {
        if (!locks_) locks_.reset(new std::mutex[kLockBuckets]);
        bool fresh = entry_ < 0;
        int32_t first = size();
        // exact-size reservation: growth-doubling slack on the vector
        // array would otherwise hold up to 2x the live bytes
        if (bf16_)
            vectors16_.reserve(vectors16_.size() + size_t(n) * dim_);
        else
            vectors_.reserve(vectors_.size() + size_t(n) * dim_);
        levels_.reserve(levels_.size() + n);
        neighbors_.reserve(neighbors_.size() + n);
        for (int i = 0; i < n; ++i) reserve_node(vecs + size_t(i) * dim_);
        int seed = std::min(n, fresh ? 1000 : 64);
        for (int i = 0; i < seed; ++i) link_node<false>(first + i);
        if (seed >= n) return;
        std::atomic<int> cursor(seed);
        auto worker = [&]() {
            int i;
            while ((i = cursor.fetch_add(1, std::memory_order_relaxed)) < n)
                link_node<true>(first + i);
        };
        unsigned hw = std::thread::hardware_concurrency();
        unsigned nt = std::min<unsigned>(
            nthreads > 0 ? unsigned(nthreads) : (hw ? hw : 1),
            unsigned(n - seed));
        if (nt <= 1) {
            for (int i = seed; i < n; ++i) link_node<false>(first + i);
            return;
        }
        std::vector<std::thread> threads;
        threads.reserve(nt - 1);
        for (unsigned t = 0; t + 1 < nt; ++t) threads.emplace_back(worker);
        worker();
        for (auto& t : threads) t.join();
    }

    // best-first search on one layer; returns up to ef candidates.
    // LOCKED=true copies each neighbor list under its bucket lock (build-
    // time traversal while writers mutate lists); LOCKED=false is the
    // lock-free read path for queries on a finished graph.
    template <bool LOCKED>
    std::vector<Candidate> search_layer_impl(const float* q, int32_t start,
                                             int ef, int layer) const {
        auto table = visited_pool_.acquire(size());
        const uint32_t ep = table->epoch;
        uint32_t* st = table->stamps.data();
        std::priority_queue<Candidate, std::vector<Candidate>, CloserFirst> to_visit;
        std::priority_queue<Candidate, std::vector<Candidate>, FartherFirst> best;
        float d0 = dist_id(q, start);
        to_visit.push({d0, start});
        best.push({d0, start});
        st[start] = ep;
        std::vector<int32_t> nbr_copy;
        while (!to_visit.empty()) {
            Candidate c = to_visit.top();
            if (c.dist > best.top().dist && int(best.size()) >= ef) break;
            to_visit.pop();
            const std::vector<int32_t>* nbrs;
            if (LOCKED) {
                std::lock_guard<std::mutex> g(node_lock(c.id));
                nbr_copy = (layer < int(neighbors_[c.id].size()))
                               ? neighbors_[c.id][layer]
                               : std::vector<int32_t>();
                nbrs = &nbr_copy;
            } else {
                nbrs = &neighbors_[c.id][layer];
            }
            for (int32_t nb : *nbrs) {
                if (st[nb] == ep) continue;
                st[nb] = ep;
                float d = dist_id(q, nb);
                if (int(best.size()) < ef || d < best.top().dist) {
                    to_visit.push({d, nb});
                    best.push({d, nb});
                    if (int(best.size()) > ef) best.pop();
                }
            }
        }
        visited_pool_.release(std::move(table));
        std::vector<Candidate> out;
        out.reserve(best.size());
        while (!best.empty()) {
            out.push_back(best.top());
            best.pop();
        }
        return out;
    }

    std::vector<Candidate> search_layer(const float* q, int32_t start, int ef,
                                        int layer) const {
        return search_layer_impl<false>(q, start, ef, layer);
    }

    void search(const float* q, int k, int ef, int32_t* out_idx,
                float* out_ip) const {
        if (entry_ < 0) {
            for (int i = 0; i < k; ++i) {
                out_idx[i] = -1;
                out_ip[i] = 0.f;
            }
            return;
        }
        int32_t cur = entry_;
        float cur_d = dist_id(q, cur);
        for (int l = max_level_; l > 0; --l) {
            bool changed = true;
            while (changed) {
                changed = false;
                for (int32_t nb : neighbors_[cur][l]) {
                    float d = dist_id(q, nb);
                    if (d < cur_d) {
                        cur_d = d;
                        cur = nb;
                        changed = true;
                    }
                }
            }
        }
        auto top = search_layer(q, cur, std::max(ef, k), 0);
        std::sort(top.begin(), top.end(),
                  [](const Candidate& a, const Candidate& b) {
                      return a.dist < b.dist;
                  });
        for (int i = 0; i < k; ++i) {
            if (i < int(top.size())) {
                out_idx[i] = top[i].id;
                out_ip[i] = -top[i].dist;
            } else {
                out_idx[i] = -1;
                out_ip[i] = 0.f;
            }
        }
    }

    // Release build-time allocation slack: vector growth doubles, and
    // per-layer neighbor lists reserve their degree caps — on a finished
    // graph both can hold ~1.5-2x the live bytes. Serial-only (call
    // after construction; appends after compaction just re-reserve).
    void compact() {
        vectors_.shrink_to_fit();
        vectors16_.shrink_to_fit();
        levels_.shrink_to_fit();
        neighbors_.shrink_to_fit();
        for (auto& per_node : neighbors_) {
            per_node.shrink_to_fit();
            for (auto& layer : per_node) layer.shrink_to_fit();
        }
    }

    size_t memory_bytes() const {
        // honest heap accounting: allocated capacities + per-vector
        // bookkeeping structs (not sizeof(vector) of the elements, which
        // only measured the header)
        size_t b = vectors_.capacity() * sizeof(float);
        b += vectors16_.capacity() * sizeof(uint16_t);
        b += levels_.capacity() * sizeof(int);
        b += neighbors_.capacity() * sizeof(neighbors_[0]);
        for (const auto& per_node : neighbors_) {
            b += per_node.capacity() * sizeof(std::vector<int32_t>);
            for (const auto& layer : per_node)
                b += layer.capacity() * sizeof(int32_t);
        }
        if (locks_) b += kLockBuckets * sizeof(std::mutex);
        return b;
    }

    bool save(const char* path) const {
        FILE* f = std::fopen(path, "wb");
        if (!f) return false;
        // v2 magic carries a dtype flag; load() still reads v1 (fp32)
        int32_t header[5] = {int32_t(0x484E5358), dim_, M_, efc_, size()};
        std::fwrite(header, sizeof(header), 1, f);
        int32_t meta[3] = {entry_, max_level_, bf16_ ? 1 : 0};
        std::fwrite(meta, sizeof(meta), 1, f);
        if (bf16_)
            std::fwrite(vectors16_.data(), sizeof(uint16_t),
                        vectors16_.size(), f);
        else
            std::fwrite(vectors_.data(), sizeof(float), vectors_.size(), f);
        std::fwrite(levels_.data(), sizeof(int), levels_.size(), f);
        for (const auto& per_node : neighbors_) {
            int32_t nl = int32_t(per_node.size());
            std::fwrite(&nl, sizeof(nl), 1, f);
            for (const auto& layer : per_node) {
                int32_t cnt = int32_t(layer.size());
                std::fwrite(&cnt, sizeof(cnt), 1, f);
                std::fwrite(layer.data(), sizeof(int32_t), layer.size(), f);
            }
        }
        std::fclose(f);
        return true;
    }

    static HNSW* load(const char* path) {
        FILE* f = std::fopen(path, "rb");
        if (!f) return nullptr;
        int32_t header[5];
        if (std::fread(header, sizeof(header), 1, f) != 1 ||
            (header[0] != int32_t(0x484E5357) &&
             header[0] != int32_t(0x484E5358))) {
            std::fclose(f);
            return nullptr;
        }
        bool v2 = header[0] == int32_t(0x484E5358);
        int n = header[4];
        // a corrupt file with a valid magic must fail CLEANLY (nullptr →
        // IOError in hnsw_index.py), not resize(-1) into a bad_alloc
        // that std::terminates across the extern "C" boundary — bound
        // every on-disk count before trusting it
        if (n < 0 || header[1] <= 0 || header[1] > (1 << 16) ||
            header[2] <= 0 || header[2] > 4096 ||
            header[3] <= 0 || header[3] > (1 << 20)) {
            std::fclose(f);
            return nullptr;
        }
        // n must be consistent with the actual file size, or a corrupt
        // huge n drives a multi-GB resize (bad_alloc) before any fread
        // can fail
        long data_at = std::ftell(f);
        std::fseek(f, 0, SEEK_END);
        long fsize = std::ftell(f);
        std::fseek(f, data_at, SEEK_SET);
        // lower bound: vectors (>=2 B/elem) + levels + one level count
        // per node; meta still unread (<= 12 B slack)
        long need = long(n) * header[1] * 2 + long(n) * 8;
        if (fsize - data_at < need) {
            std::fclose(f);
            return nullptr;
        }
        int32_t meta[3] = {0, 0, 0};
        size_t meta_n = v2 ? 3 : 2;
        if (std::fread(meta, sizeof(int32_t), meta_n, f) != meta_n) {
            std::fclose(f);
            return nullptr;
        }
        if (meta[0] < -1 || meta[0] >= n || meta[1] < 0 || meta[1] > 64) {
            std::fclose(f);
            return nullptr;
        }
        bool bf16 = v2 && meta[2] != 0;
        HNSW* h = new HNSW(header[1], header[2], header[3], 0, bf16);
        h->entry_ = meta[0];
        h->max_level_ = meta[1];
        h->levels_.resize(n);
        if (bf16)
            h->vectors16_.resize(size_t(n) * h->dim_);
        else
            h->vectors_.resize(size_t(n) * h->dim_);
        if (n) {
            size_t want = size_t(n) * h->dim_;
            size_t got = bf16
                ? std::fread(h->vectors16_.data(), sizeof(uint16_t), want, f)
                : std::fread(h->vectors_.data(), sizeof(float), want, f);
            if (got != want ||
                std::fread(h->levels_.data(), sizeof(int), n, f) != size_t(n)) {
                std::fclose(f); delete h; return nullptr;
            }
        }
        h->neighbors_.resize(n);
        for (int i = 0; i < n; ++i) {
            int32_t nl;
            if (std::fread(&nl, sizeof(nl), 1, f) != 1 ||
                nl < 0 || nl > 64) { std::fclose(f); delete h; return nullptr; }
            h->neighbors_[i].resize(nl);
            for (int l = 0; l < nl; ++l) {
                int32_t cnt;
                if (std::fread(&cnt, sizeof(cnt), 1, f) != 1 ||
                    cnt < 0 || cnt > 4096) { std::fclose(f); delete h; return nullptr; }
                h->neighbors_[i][l].resize(cnt);
                if (cnt && std::fread(h->neighbors_[i][l].data(), sizeof(int32_t), cnt, f) != size_t(cnt)) {
                    std::fclose(f); delete h; return nullptr;
                }
                for (int32_t c = 0; c < cnt; ++c) {
                    int32_t id = h->neighbors_[i][l][c];
                    // out-of-range ids would read past vec()/stamps[]
                    // during the first search
                    if (id < 0 || id >= n) { std::fclose(f); delete h; return nullptr; }
                }
            }
        }
        std::fclose(f);
        return h;
    }

  private:
    // Alg. 4 neighbor selection: greedy diversity filter over candidates
    // sorted by distance ascending.
    std::vector<Candidate> select_heuristic(const std::vector<Candidate>& sorted,
                                            int m) const {
        std::vector<Candidate> out;
        for (const Candidate& c : sorted) {
            if (int(out.size()) >= m) break;
            bool good = true;
            for (const Candidate& s : out) {
                if (dist_nodes(c.id, s.id) < c.dist) {
                    good = false;
                    break;
                }
            }
            if (good) out.push_back(c);
        }
        // backfill with closest skipped candidates if the filter was too
        // aggressive (keeps degree near m; matches hnswlib behavior)
        if (int(out.size()) < m) {
            for (const Candidate& c : sorted) {
                if (int(out.size()) >= m) break;
                bool present = false;
                for (const Candidate& s : out)
                    if (s.id == c.id) { present = true; break; }
                if (!present) out.push_back(c);
            }
        }
        return out;
    }

    void prune(int32_t id, int layer, int cap) {
        auto& nbrs = neighbors_[id][layer];
        std::vector<Candidate> cands;
        cands.reserve(nbrs.size());
        for (int32_t nb : nbrs) cands.push_back({dist_nodes(id, nb), nb});
        std::sort(cands.begin(), cands.end(),
                  [](const Candidate& a, const Candidate& b) {
                      return a.dist < b.dist;
                  });
        auto selected = select_heuristic(cands, cap);
        nbrs.clear();
        for (const Candidate& s : selected) nbrs.push_back(s.id);
    }

    int dim_, M_, M0_, efc_;
    bool bf16_;
    double mult_;
    std::mt19937_64 rng_;
    std::uniform_real_distribution<double> uniform_{
        std::nextafter(0.0, 1.0), 1.0};
    int32_t entry_;
    int max_level_;
    std::vector<float> vectors_;
    std::vector<uint16_t> vectors16_;
    std::vector<int> levels_;
    std::vector<std::vector<std::vector<int32_t>>> neighbors_;
    mutable VisitedPool visited_pool_;
    // parallel-build synchronization: bucketed per-node mutexes (lazily
    // allocated — load()-ed/query-only indexes never pay the array) + a
    // global mutex for the (entry_, max_level_) pair
    static constexpr size_t kLockBuckets = 65536;
    mutable std::unique_ptr<std::mutex[]> locks_;
    mutable std::mutex entry_mu_;
};

}  // namespace

extern "C" {

void* hnsw_create(int dim, int M, int ef_construction, uint64_t seed) {
    return new HNSW(dim, M, ef_construction, seed);
}

// bf16=1 stores vectors as bfloat16 (half the graph memory; queries stay
// fp32, distances decode on the fly)
void* hnsw_create2(int dim, int M, int ef_construction, uint64_t seed,
                   int bf16) {
    return new HNSW(dim, M, ef_construction, seed, bf16 != 0);
}

int hnsw_is_bf16(void* h) { return static_cast<HNSW*>(h)->bf16() ? 1 : 0; }

// release build-time allocation slack (serial only)
void hnsw_compact(void* h) { static_cast<HNSW*>(h)->compact(); }

void hnsw_free(void* h) { delete static_cast<HNSW*>(h); }

void hnsw_add_batch(void* h, int n, const float* vecs) {
    HNSW* idx = static_cast<HNSW*>(h);
    for (int i = 0; i < n; ++i) idx->add(vecs + size_t(i) * idx->dim());
}

// Parallel construction: nthreads<=0 uses all hardware threads. Level
// structure stays deterministic; link order (and thus exact neighbor
// sets) is thread-interleaved, recall-equivalent.
void hnsw_add_batch_parallel(void* h, int n, const float* vecs, int nthreads) {
    static_cast<HNSW*>(h)->add_batch_parallel(n, vecs, nthreads);
}

void hnsw_search_batch(void* h, int nq, const float* queries, int k, int ef,
                       int32_t* out_idx, float* out_ip) {
    HNSW* idx = static_cast<HNSW*>(h);
    // reads are lock-free after build: fan the batch across hardware
    // threads (work-stealing via an atomic cursor). Degenerates to the
    // serial loop on single-core hosts or single-query batches.
    unsigned hw = std::thread::hardware_concurrency();
    unsigned nthreads = std::min<unsigned>(hw ? hw : 1, unsigned(nq));
    if (nthreads <= 1) {
        for (int i = 0; i < nq; ++i)
            idx->search(queries + size_t(i) * idx->dim(), k, ef,
                        out_idx + size_t(i) * k, out_ip + size_t(i) * k);
        return;
    }
    std::atomic<int> cursor(0);
    auto worker = [&]() {
        int i;
        while ((i = cursor.fetch_add(1, std::memory_order_relaxed)) < nq)
            idx->search(queries + size_t(i) * idx->dim(), k, ef,
                        out_idx + size_t(i) * k, out_ip + size_t(i) * k);
    };
    std::vector<std::thread> threads;
    threads.reserve(nthreads - 1);
    for (unsigned t = 0; t + 1 < nthreads; ++t) threads.emplace_back(worker);
    worker();
    for (auto& t : threads) t.join();
}

int hnsw_size(void* h) { return static_cast<HNSW*>(h)->size(); }
int hnsw_dim(void* h) { return static_cast<HNSW*>(h)->dim(); }
uint64_t hnsw_memory_bytes(void* h) {
    return static_cast<HNSW*>(h)->memory_bytes();
}
int hnsw_save(void* h, const char* path) {
    return static_cast<HNSW*>(h)->save(path) ? 1 : 0;
}
void* hnsw_load(const char* path) {
    // belt-and-braces: a corrupt file must NEVER throw across the
    // ctypes boundary (std::terminate) — any allocation/length error
    // becomes the nullptr → IOError contract
    try {
        return HNSW::load(path);
    } catch (...) {
        return nullptr;
    }
}

}  // extern "C"
