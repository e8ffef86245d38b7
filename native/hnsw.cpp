// First-party HNSW graph index (Malkov & Yashunin, TPAMI'20) for host-side
// approximate MIPS — the graph-ANN family the reference gets from faiss
// (FaissHNSWIndexer, matchmaker/retrieval/faiss_indices.py:76-104).
//
// Graph traversal is data-dependent pointer chasing — a poor fit for the
// TPU's static-shape dataflow — so like faiss it runs on the host CPU, as
// native code behind a C ABI (ctypes wrapper: matchmaker_tpu/retrieval/hnsw.py).
// Metric: inner product (distance = -dot), matching IndexFlatIP semantics.
//
// Build: make -C native  (produces libmmhnsw.so)

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
#include <vector>

namespace {

// 1-byte spinlock so 8.8M nodes cost 8.8MB of lock state, not 350MB of mutexes
struct SpinLock {
    std::atomic_flag flag = ATOMIC_FLAG_INIT;
    void lock() { while (flag.test_and_set(std::memory_order_acquire)) {} }
    void unlock() { flag.clear(std::memory_order_release); }
};

struct HNSW {
    int dim = 0;
    int M = 16;              // neighbors per node on layers > 0
    int M0 = 32;             // neighbors on layer 0 (2*M)
    int ef_construction = 200;
    double mult = 0.0;       // level multiplier 1/ln(M)
    int entry = -1;
    int max_level = -1;
    std::mt19937 rng;

    std::vector<float> vecs;              // n * dim
    std::vector<int> levels;              // level per node
    // layer 0 holds every node (slot == id); upper layers store links only
    // for the ~N/M^l nodes that reach them, addressed through slot_of[l]
    // (an int per node per layer instead of `width` ints: 16x less padding)
    std::vector<std::vector<int>> links;    // links[l][slot*width .. +width)
    std::vector<std::vector<int>> slot_of;  // slot_of[l][node] (-1 = absent), l >= 1
    // parallel-build state: per-node adjacency spinlocks + a global mutex for
    // entry-point updates (reads of neighbor ints are deliberately unlocked —
    // int32 loads don't tear on the targets we care about, faiss does the same)
    std::unique_ptr<SpinLock[]> locks;
    size_t locks_cap = 0;
    std::mutex global_mu;

    int size() const { return (int)levels.size(); }

    float dist(const float* a, const float* b) const {
        float dot = 0.f;
        for (int i = 0; i < dim; i++) dot += a[i] * b[i];
        return -dot;  // lower = better
    }
    const float* vec(int id) const { return vecs.data() + (size_t)id * dim; }

    int width(int level) const { return level == 0 ? M0 : M; }

    void ensure_layer(int level) {
        while ((int)links.size() <= level) links.emplace_back();
        while ((int)slot_of.size() <= level) slot_of.emplace_back();
    }

    int* node_links(int level, int id) {
        size_t slot = level == 0 ? (size_t)id : (size_t)slot_of[level][id];
        return links[level].data() + slot * width(level);
    }
    const int* node_links(int level, int id) const {
        size_t slot = level == 0 ? (size_t)id : (size_t)slot_of[level][id];
        return links[level].data() + slot * width(level);
    }

    // greedy descent on one layer: move to the best neighbor until no
    // improvement
    int greedy(const float* q, int start, int level) const {
        int cur = start;
        float cur_d = dist(q, vec(cur));
        bool improved = true;
        while (improved) {
            improved = false;
            const int* nb = node_links(level, cur);
            for (int i = 0; i < width(level); i++) {
                int n = nb[i];
                if (n < 0) break;
                float d = dist(q, vec(n));
                if (d < cur_d) { cur_d = d; cur = n; improved = true; }
            }
        }
        return cur;
    }

    // best-first search on one layer; returns up to ef (dist, id) pairs
    // sorted ascending by distance
    std::vector<std::pair<float, int>> search_layer(
            const float* q, int start, int ef, int level,
            std::vector<uint8_t>& visited, std::vector<int>& touched) const {
        // visited is a reusable byte map; touched records set bits for reset
        auto mark = [&](int id) { visited[id] = 1; touched.push_back(id); };
        // candidates: min-heap by distance; results: max-heap by distance
        std::priority_queue<std::pair<float, int>, std::vector<std::pair<float, int>>,
                            std::greater<>> cand;
        std::priority_queue<std::pair<float, int>> result;
        float d0 = dist(q, vec(start));
        cand.emplace(d0, start);
        result.emplace(d0, start);
        mark(start);
        while (!cand.empty()) {
            auto [d, c] = cand.top();
            if (d > result.top().first && (int)result.size() >= ef) break;
            cand.pop();
            const int* nb = node_links(level, c);
            for (int i = 0; i < width(level); i++) {
                int n = nb[i];
                if (n < 0) break;
                if (visited[n]) continue;
                mark(n);
                float dn = dist(q, vec(n));
                if ((int)result.size() < ef || dn < result.top().first) {
                    cand.emplace(dn, n);
                    result.emplace(dn, n);
                    if ((int)result.size() > ef) result.pop();
                }
            }
        }
        std::vector<std::pair<float, int>> out(result.size());
        for (int i = (int)result.size() - 1; i >= 0; i--) {
            out[i] = result.top();
            result.pop();
        }
        return out;
    }

    // neighbor selection heuristic (paper Alg. 4): keep a candidate only if
    // it is closer to the query than to every already-selected neighbor
    void select_neighbors(const float* q, std::vector<std::pair<float, int>>& cand,
                          int m, std::vector<int>& out) const {
        (void)q;
        out.clear();
        for (auto& [d, id] : cand) {
            if ((int)out.size() >= m) break;
            bool keep = true;
            for (int sel : out) {
                if (dist(vec(id), vec(sel)) < d) { keep = false; break; }
            }
            if (keep) out.push_back(id);
        }
        // backfill with nearest skipped candidates if the heuristic was too
        // aggressive (faiss does the same)
        if ((int)out.size() < m) {
            for (auto& [d, id] : cand) {
                (void)d;
                if ((int)out.size() >= m) break;
                if (std::find(out.begin(), out.end(), id) == out.end()) out.push_back(id);
            }
        }
    }

    void link(int level, int a, int b) {
        locks[a].lock();
        int* nb = node_links(level, a);
        int w = width(level);
        for (int i = 0; i < w; i++) {
            if (nb[i] == b) { locks[a].unlock(); return; }
            if (nb[i] < 0) { nb[i] = b; locks[a].unlock(); return; }
        }
        // full: re-select the best w among existing + b
        std::vector<std::pair<float, int>> cand;
        cand.reserve(w + 1);
        for (int i = 0; i < w; i++) cand.emplace_back(dist(vec(a), vec(nb[i])), nb[i]);
        cand.emplace_back(dist(vec(a), vec(b)), b);
        std::sort(cand.begin(), cand.end());
        std::vector<int> sel;
        select_neighbors(vec(a), cand, w, sel);
        for (int i = 0; i < w; i++) nb[i] = i < (int)sel.size() ? sel[i] : -1;
        locks[a].unlock();
    }

    // insert node `id` into the graph; vecs/levels/links/locks already sized
    // (add_batch pre-allocates) — safe to run concurrently across ids
    void insert(int id, std::vector<uint8_t>& visited, std::vector<int>& touched) {
        const float* v = vec(id);
        int level = levels[id];
        int start_entry, start_max;
        {
            std::lock_guard<std::mutex> g(global_mu);
            start_entry = entry;
            start_max = max_level;
        }
        int cur = start_entry;
        for (int l = start_max; l > level; l--) cur = greedy(v, cur, l);
        for (int l = std::min(level, start_max); l >= 0; l--) {
            for (int t : touched) visited[t] = 0;
            touched.clear();
            auto cand = search_layer(v, cur, ef_construction, l, visited, touched);
            std::vector<int> sel;
            select_neighbors(v, cand, M, sel);
            locks[id].lock();
            int* nb = node_links(l, id);
            for (size_t i = 0; i < sel.size() && i < (size_t)width(l); i++) nb[i] = sel[i];
            locks[id].unlock();
            for (int s : sel) link(l, s, id);
            if (!cand.empty()) cur = cand[0].second;
        }
        if (level > start_max) {
            std::lock_guard<std::mutex> g(global_mu);
            if (level > max_level) { max_level = level; entry = id; }
        }
    }

    void add_batch(const float* v, int n) {
        int base = size();
        vecs.insert(vecs.end(), v, v + (size_t)n * dim);
        std::uniform_real_distribution<double> unif(0.0, 1.0);
        int batch_max = -1;
        levels.reserve(base + n);
        for (int i = 0; i < n; i++) {
            int level = (int)std::floor(-std::log(std::max(unif(rng), 1e-12)) * mult);
            levels.push_back(level);
            batch_max = std::max(batch_max, level);
        }
        ensure_layer(std::max(batch_max, std::max(max_level, 0)));
        links[0].resize((size_t)(base + n) * width(0), -1);
        for (size_t l = 1; l < links.size(); l++) {
            slot_of[l].resize(base + n, -1);
            size_t count = links[l].size() / width((int)l);
            for (int i = 0; i < n; i++)
                if (levels[base + i] >= (int)l) slot_of[l][base + i] = (int)count++;
            links[l].resize(count * width((int)l), -1);
        }
        if ((size_t)(base + n) > locks_cap) {
            locks = std::make_unique<SpinLock[]>(base + n);  // all unlocked here
            locks_cap = base + n;
        }

        int first = 0;
        if (entry < 0) {  // seed the graph serially with the first node
            entry = base;
            max_level = levels[base];
            first = 1;
        }
        #pragma omp parallel
        {
            std::vector<uint8_t> visited(base + n, 0);
            std::vector<int> touched;
            #pragma omp for schedule(dynamic, 64)
            for (int i = first; i < n; i++) insert(base + i, visited, touched);
        }
    }

    void search(const float* q, int k, int ef, float* out_scores, int64_t* out_ids,
                std::vector<uint8_t>& visited, std::vector<int>& touched) const {
        if (entry < 0) {
            for (int i = 0; i < k; i++) { out_scores[i] = -INFINITY; out_ids[i] = -1; }
            return;
        }
        // caller-provided scratch: reset only the touched bytes from the
        // previous query instead of memset-ing O(N) per query
        if ((int)visited.size() < size()) visited.assign(size(), 0);
        for (int t : touched) visited[t] = 0;
        touched.clear();
        int cur = entry;
        for (int l = max_level; l > 0; l--) cur = greedy(q, cur, l);
        auto res = search_layer(q, cur, std::max(ef, k), 0, visited, touched);
        int n = std::min((int)res.size(), k);
        for (int i = 0; i < n; i++) {
            out_scores[i] = -res[i].first;  // back to inner product
            out_ids[i] = res[i].second;
        }
        for (int i = n; i < k; i++) { out_scores[i] = -INFINITY; out_ids[i] = -1; }
    }
};

}  // namespace

extern "C" {

void* mm_hnsw_new(int dim, int M, int ef_construction, unsigned seed) {
    auto* h = new HNSW();
    h->dim = dim;
    h->M = M;
    h->M0 = 2 * M;
    h->ef_construction = ef_construction;
    h->mult = 1.0 / std::log(std::max(2.0, (double)M));
    h->rng.seed(seed);
    return h;
}

void mm_hnsw_add_batch(void* ptr, const float* vecs, int n) {
    ((HNSW*)ptr)->add_batch(vecs, n);
}

int mm_hnsw_size(void* ptr) { return ((HNSW*)ptr)->size(); }

void mm_hnsw_search_batch(void* ptr, const float* queries, int nq, int k,
                          int ef_search, float* out_scores, int64_t* out_ids) {
    auto* h = (HNSW*)ptr;
    #pragma omp parallel
    {
        std::vector<uint8_t> visited((size_t)h->size(), 0);
        std::vector<int> touched;
        #pragma omp for schedule(dynamic)
        for (int i = 0; i < nq; i++) {
            h->search(queries + (size_t)i * h->dim, k, ef_search,
                      out_scores + (size_t)i * k, out_ids + (size_t)i * k,
                      visited, touched);
        }
    }
}

int mm_hnsw_save(void* ptr, const char* path) {
    auto* h = (HNSW*)ptr;
    FILE* f = fopen(path, "wb");
    if (!f) return -1;
    int n = h->size(), n_layers = (int)h->links.size();
    fwrite(&h->dim, 4, 1, f);
    fwrite(&h->M, 4, 1, f);
    fwrite(&h->M0, 4, 1, f);
    fwrite(&h->ef_construction, 4, 1, f);
    fwrite(&h->entry, 4, 1, f);
    fwrite(&h->max_level, 4, 1, f);
    fwrite(&n, 4, 1, f);
    fwrite(&n_layers, 4, 1, f);
    fwrite(h->vecs.data(), 4, h->vecs.size(), f);
    fwrite(h->levels.data(), 4, h->levels.size(), f);
    for (auto& layer : h->links) {
        int64_t sz = (int64_t)layer.size();
        fwrite(&sz, 8, 1, f);
        fwrite(layer.data(), 4, layer.size(), f);
    }
    for (size_t l = 1; l < h->links.size(); l++) {
        int64_t sz = (int64_t)h->slot_of[l].size();
        fwrite(&sz, 8, 1, f);
        fwrite(h->slot_of[l].data(), 4, h->slot_of[l].size(), f);
    }
    fclose(f);
    return 0;
}

void* mm_hnsw_load(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) return nullptr;
    auto* h = new HNSW();
    int n = 0, n_layers = 0;
    bool ok = fread(&h->dim, 4, 1, f) == 1 && fread(&h->M, 4, 1, f) == 1 &&
              fread(&h->M0, 4, 1, f) == 1 && fread(&h->ef_construction, 4, 1, f) == 1 &&
              fread(&h->entry, 4, 1, f) == 1 && fread(&h->max_level, 4, 1, f) == 1 &&
              fread(&n, 4, 1, f) == 1 && fread(&n_layers, 4, 1, f) == 1;
    if (!ok) { fclose(f); delete h; return nullptr; }
    h->mult = 1.0 / std::log(std::max(2.0, (double)h->M));
    h->vecs.resize((size_t)n * h->dim);
    h->levels.resize(n);
    ok = fread(h->vecs.data(), 4, h->vecs.size(), f) == h->vecs.size() &&
         fread(h->levels.data(), 4, h->levels.size(), f) == h->levels.size();
    h->links.resize(n_layers);
    for (auto& layer : h->links) {
        int64_t sz = 0;
        ok = ok && fread(&sz, 8, 1, f) == 1;
        layer.resize(sz);
        ok = ok && fread(layer.data(), 4, layer.size(), f) == layer.size();
    }
    h->slot_of.resize(n_layers);
    for (int l = 1; l < n_layers; l++) {
        int64_t sz = 0;
        ok = ok && fread(&sz, 8, 1, f) == 1;
        h->slot_of[l].resize(sz);
        ok = ok && fread(h->slot_of[l].data(), 4, h->slot_of[l].size(), f) == h->slot_of[l].size();
    }
    fclose(f);
    if (!ok) { delete h; return nullptr; }
    return h;
}

void mm_hnsw_free(void* ptr) { delete (HNSW*)ptr; }

}  // extern "C"
