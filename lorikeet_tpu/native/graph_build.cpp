// Read-threading graph construction — native host kernel.
//
// Exact semantics of assembly/graph.py::ReadThreadingGraph.build (the
// conformance spec), which mirrors the reference's threading algorithm
// (/root/reference/src/read_threading/read_threading_graph.rs:111-140
// non-unique kmer detection, :484-660 threading: reads start at their first
// unique kmer, chains extend by suffix match, unique kmers merge through the
// kmer->vertex map).  Sequences must arrive reference-first, in thread
// order; the caller reconstructs its edge objects from the returned arrays.
#include <cstddef>
#include <cstdint>
#include <string_view>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

struct EdgeRec {
    int32_t u, v;
    int32_t mult;
    uint8_t is_ref;
};

struct Builder {
    int k;
    const uint8_t* buf;
    std::unordered_map<std::string_view, int32_t> kmer_to_vertex;
    std::unordered_set<std::string_view> non_unique;
    std::vector<const uint8_t*> vertex_kmer;       // ptr into buf
    std::vector<std::vector<int32_t>> out_adj;     // vertex -> edge indices
    std::vector<EdgeRec> edges;
    std::vector<int32_t> ref_path;

    std::string_view sv(const uint8_t* p) const {
        return std::string_view(reinterpret_cast<const char*>(p), k);
    }

    int32_t new_vertex(const uint8_t* kp) {
        const int32_t vid = (int32_t)vertex_kmer.size();
        vertex_kmer.push_back(kp);
        out_adj.emplace_back();
        const auto key = sv(kp);
        if (!non_unique.count(key))
            kmer_to_vertex.emplace(key, vid);  // no-op if already mapped
        return vid;
    }

    int32_t get_or_new(const uint8_t* kp) {
        const auto it = kmer_to_vertex.find(sv(kp));
        if (it != kmer_to_vertex.end()) return it->second;
        return new_vertex(kp);
    }

    int32_t edge(int32_t u, int32_t v, bool is_ref) {
        for (const int32_t ei : out_adj[u])
            if (edges[ei].v == v) {
                if (is_ref) edges[ei].is_ref = 1;
                return ei;
            }
        const int32_t ei = (int32_t)edges.size();
        edges.push_back({u, v, 0, (uint8_t)(is_ref ? 1 : 0)});
        out_adj[u].push_back(ei);
        return ei;
    }

    int32_t extend(int32_t prev, const uint8_t* seq, int64_t kmer_start,
                   int32_t count, bool is_ref) {
        const uint8_t next_base = seq[kmer_start + k - 1];
        for (const int32_t ei : out_adj[prev]) {
            EdgeRec& e = edges[ei];
            if (vertex_kmer[e.v][k - 1] == next_base) {
                e.mult += count;
                if (is_ref) e.is_ref = 1;
                return e.v;
            }
        }
        const int32_t vid = get_or_new(seq + kmer_start);
        const int32_t ei = edge(prev, vid, is_ref);
        edges[ei].mult += count;
        return vid;
    }

    void thread(const uint8_t* seq, int64_t len, int32_t count, bool is_ref) {
        if (len < k + 1) return;
        int64_t start = 0;
        if (!is_ref) {
            start = -1;
            for (int64_t i = 0; i < len - k; i++)
                if (kmer_to_vertex.count(sv(seq + i))) { start = i; break; }
            if (start < 0) return;
        }
        if (len <= start + k) return;
        int32_t vid = get_or_new(seq + start);
        if (is_ref) { ref_path.clear(); ref_path.push_back(vid); }
        for (int64_t i = start + 1; i <= len - k; i++) {
            vid = extend(vid, seq, i, count, is_ref);
            if (is_ref) ref_path.push_back(vid);
        }
    }
};

}  // namespace

// Returns 0 on success.  Outputs are caller-allocated; capacities must be
// >= the total kmer-position count (a safe upper bound for vertices, edges
// and the ref path alike).  out_counts = {n_vertices, n_edges, ref_path_len}.
extern "C" int graph_build(
    const uint8_t* seq_buf, const int64_t* seq_off, const int32_t* counts,
    const uint8_t* is_ref, int64_t n_seqs, int k,
    int64_t* vertex_kmer_off, int32_t* edge_u, int32_t* edge_v,
    int32_t* edge_mult, uint8_t* edge_is_ref, int32_t* ref_path,
    int64_t cap, int64_t* out_counts) {
    Builder b;
    b.k = k;
    b.buf = seq_buf;
    // per-sequence non-unique kmers, unioned (determine_non_unique_kmers)
    std::unordered_set<std::string_view> seen;
    for (int64_t s = 0; s < n_seqs; s++) {
        const uint8_t* seq = seq_buf + seq_off[s];
        const int64_t len = seq_off[s + 1] - seq_off[s];
        seen.clear();
        for (int64_t i = 0; i + k <= len; i++) {
            const auto km = b.sv(seq + i);
            if (!seen.insert(km).second) b.non_unique.insert(km);
        }
    }
    b.kmer_to_vertex.reserve((size_t)cap);
    for (int64_t s = 0; s < n_seqs; s++)
        b.thread(seq_buf + seq_off[s], seq_off[s + 1] - seq_off[s],
                 counts[s], is_ref[s] != 0);

    const int64_t nv = (int64_t)b.vertex_kmer.size();
    const int64_t ne = (int64_t)b.edges.size();
    const int64_t nr = (int64_t)b.ref_path.size();
    if (nv > cap || ne > cap || nr > cap) return 1;
    for (int64_t i = 0; i < nv; i++)
        vertex_kmer_off[i] = b.vertex_kmer[i] - seq_buf;
    for (int64_t i = 0; i < ne; i++) {
        edge_u[i] = b.edges[i].u;
        edge_v[i] = b.edges[i].v;
        edge_mult[i] = b.edges[i].mult;
        edge_is_ref[i] = b.edges[i].is_ref;
    }
    for (int64_t i = 0; i < nr; i++) ref_path[i] = b.ref_path[i];
    out_counts[0] = nv;
    out_counts[1] = ne;
    out_counts[2] = nr;
    return 0;
}
