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
#include <cstring>
#include <string_view>
#include <unordered_map>
#include <unordered_set>
#include <vector>

#include <algorithm>

namespace {

struct EdgeRec {
    int32_t u, v;
    int32_t mult;
    uint8_t is_ref;
    int32_t cur = 0;               // multiplicity within the current sample
    int32_t born = 0;              // flush counter at creation
    int32_t flushed = 0;           // flushes in which this edge was touched
    std::vector<int32_t> kept;     // top num_pruning_samples per-sample counts
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

    std::vector<int32_t> touched;  // edges hit within the current sample
    int nps = 1;

    int flush_count = 0;

    void bump(int32_t ei, int32_t count) {
        EdgeRec& e = edges[ei];
        if (e.kept.empty() && e.mult == 0 && e.cur == 0) {
            // the creation multiplicity seeds the per-sample heap as its
            // own entry (MultiSampleEdge::set, multi_sample_edge.rs:57-67)
            e.kept.push_back(count);
            e.born = flush_count;
        }
        e.mult += count;
        if (e.cur == 0) touched.push_back(ei);
        e.cur += count;
    }

    // roll per-sample multiplicities at a sample boundary
    // (multi_sample_edge.rs flush_single_sample_multiplicity; untouched
    // edges' zero-flushes are accounted lazily in pruning_mult)
    void flush_sample() {
        for (const int32_t ei : touched) {
            EdgeRec& e = edges[ei];
            e.kept.push_back(e.cur);
            std::sort(e.kept.begin(), e.kept.end(), std::greater<int32_t>());
            if ((int)e.kept.size() > nps) e.kept.resize(nps);
            e.cur = 0;
            e.flushed++;
        }
        touched.clear();
        flush_count++;
    }

    // heap minimum of {seed} + per-sample totals, where samples that never
    // touched the edge flushed a 0 (multi_sample_edge.rs
    // get_pruning_multiplicity peeks the capped min-heap)
    int32_t pruning_mult(const EdgeRec& e) const {
        if ((int)e.kept.size() >= nps) return e.kept[nps - 1];
        // fewer positive values than capacity: a zero-flush survives if any
        const int zero_flushes = (flush_count - e.born) - e.flushed;
        if (zero_flushes > 0) return 0;
        return e.kept.empty() ? 0 : e.kept.back();
    }

    int32_t extend(int32_t prev, const uint8_t* seq, int64_t kmer_start,
                   int32_t count, bool is_ref) {
        const uint8_t next_base = seq[kmer_start + k - 1];
        for (const int32_t ei : out_adj[prev]) {
            EdgeRec& e = edges[ei];
            if (vertex_kmer[e.v][k - 1] == next_base) {
                bump(ei, count);
                if (is_ref) e.is_ref = 1;
                return e.v;
            }
        }
        const int32_t vid = get_or_new(seq + kmer_start);
        const int32_t ei = edge(prev, vid, is_ref);
        bump(ei, count);
        return vid;
    }

    // reads start at their first unique kmer (GATK default when dangling
    // recovery is on: read_threading_graph.rs:239-248 is_threading_start
    // with start_threading_only_at_existing_vertex=false) — unknown start
    // kmers create new dangling-head chains that recovery can merge back
    bool start_only_at_existing = true;

    void thread(const uint8_t* seq, int64_t len, int32_t count, bool is_ref) {
        if (len < k + 1) return;
        int64_t start = 0;
        if (!is_ref) {
            start = -1;
            for (int64_t i = 0; i < len - k; i++) {
                const auto key = sv(seq + i);
                const bool ok = start_only_at_existing
                    ? kmer_to_vertex.count(key) != 0
                    : non_unique.count(key) == 0;
                if (ok) { start = i; break; }
            }
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
    std::vector<uint8_t> removed;          // per-edge tombstones
    std::vector<std::vector<int32_t>> in_adj;

    void index_in_edges() {
        in_adj.assign(vertex_kmer.size(), {});
        removed.assign(edges.size(), 0);
        for (size_t ei = 0; ei < edges.size(); ei++)
            in_adj[edges[ei].v].push_back((int32_t)ei);
    }

    int in_deg(int32_t v) const {
        int d = 0;
        for (const int32_t ei : in_adj[v]) d += !removed[ei];
        return d;
    }
    int out_deg(int32_t v) const {
        int d = 0;
        for (const int32_t ei : out_adj[v]) d += !removed[ei];
        return d;
    }

    // Kahn peel (graph.py has_cycle)
    bool has_cycle() const {
        const int64_t n = (int64_t)vertex_kmer.size();
        std::vector<int32_t> indeg(n, 0);
        for (const EdgeRec& e : edges) indeg[e.v]++;
        std::vector<int32_t> stack;
        for (int64_t v = 0; v < n; v++)
            if (!indeg[v]) stack.push_back((int32_t)v);
        int64_t seen = 0;
        while (!stack.empty()) {
            const int32_t v = stack.back();
            stack.pop_back();
            seen++;
            for (const int32_t ei : out_adj[v])
                if (!--indeg[edges[ei].v]) stack.push_back(edges[ei].v);
        }
        return seen != n;
    }

    // linear chains + low-weight pruning + orphan removal
    // (chain_pruner.rs:58-121, low_weight_chain_pruner.rs,
    //  graph.py prune_low_weight_chains/_remove_orphans)
    void prune_low_weight_chains(int prune_factor) {
        if (prune_factor <= 0) return;
        const int64_t n = (int64_t)vertex_kmer.size();
        std::vector<int32_t> chain_starts;
        std::vector<uint8_t> seen(n, 0);
        for (int64_t v = 0; v < n; v++)
            if (in_deg((int32_t)v) == 0) {
                chain_starts.push_back((int32_t)v);
                seen[v] = 1;
            }
        // phase 1: enumerate all chains on the unpruned graph (python
        // find_chains computes the full chain list before any removal)
        std::vector<std::vector<int32_t>> chains;
        for (size_t qi = 0; qi < chain_starts.size(); qi++) {
            const int32_t first = chain_starts[qi];
            for (const int32_t ei0 : out_adj[first]) {
                std::vector<int32_t> chain{ei0};
                int32_t last = edges[ei0].v;
                while (out_deg(last) == 1 && in_deg(last) <= 1
                       && last != first) {
                    const int32_t nxt = out_adj[last].front();
                    chain.push_back(nxt);
                    last = edges[nxt].v;
                }
                chains.push_back(std::move(chain));
                if (!seen[last]) {
                    seen[last] = 1;
                    chain_starts.push_back(last);
                }
            }
        }
        // phase 2: prune chains whose every edge is non-ref and low-weight
        for (const auto& chain : chains) {
            bool all_low = true;
            for (const int32_t ei : chain)
                if (edges[ei].is_ref
                    || pruning_mult(edges[ei]) >= prune_factor) {
                    all_low = false;
                    break;
                }
            if (all_low)
                for (const int32_t ei : chain) removed[ei] = 1;
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

namespace {

// Speculative seq-graph zip (graph.py remove_paths_not_connected_to_ref +
// seq_graph.py from_kmer_graph fused): only legal when no dangling-end
// recovery can change the graph afterwards.  Writes the zipped seq graph
// (vertex byte spans + inter-chain edges) and returns true, or returns
// false when it doesn't apply (dangling ends present with recovery on,
// capacity exceeded) — the caller then falls back to the full kmer-graph
// handover.
bool try_zip(Builder& b, bool recovery_on, int64_t cap_z, uint8_t* zseq,
             int64_t* zv_bounds, int32_t* ze_u, int32_t* ze_v,
             int32_t* ze_mult, uint8_t* ze_ref, int64_t* zcounts) {
    const int64_t n = (int64_t)b.vertex_kmer.size();
    if (b.ref_path.empty() || n == 0) return false;
    std::vector<uint8_t> ref_set(n, 0);
    for (const int32_t v : b.ref_path) ref_set[v] = 1;
    // degrees over surviving (non-tombstoned) edges
    std::vector<int32_t> ind(n, 0), outd(n, 0);
    for (size_t ei = 0; ei < b.edges.size(); ei++) {
        if (b.removed[ei]) continue;
        outd[b.edges[ei].u]++;
        ind[b.edges[ei].v]++;
    }
    if (recovery_on) {
        // graph.py recover_dangling_ends candidates: non-ref sinks/sources
        for (int64_t v = 0; v < n; v++) {
            if (ref_set[v]) continue;
            if ((outd[v] == 0 && ind[v] > 0) || (ind[v] == 0 && outd[v] > 0))
                return false;
        }
    }
    // remove_paths_not_connected_to_ref: an edge survives iff both
    // endpoints are forward-reachable from ref_source AND backward-
    // reachable from ref_sink (python removes all edges of bad vertices)
    std::vector<uint8_t> fwd(n, 0), bwd(n, 0);
    std::vector<int32_t> stack;
    fwd[b.ref_path.front()] = 1;
    stack.push_back(b.ref_path.front());
    while (!stack.empty()) {
        const int32_t v = stack.back();
        stack.pop_back();
        for (const int32_t ei : b.out_adj[v])
            if (!b.removed[ei] && !fwd[b.edges[ei].v]) {
                fwd[b.edges[ei].v] = 1;
                stack.push_back(b.edges[ei].v);
            }
    }
    bwd[b.ref_path.back()] = 1;
    stack.push_back(b.ref_path.back());
    while (!stack.empty()) {
        const int32_t v = stack.back();
        stack.pop_back();
        for (const int32_t ei : b.in_adj[v])
            if (!b.removed[ei] && !bwd[b.edges[ei].u]) {
                bwd[b.edges[ei].u] = 1;
                stack.push_back(b.edges[ei].u);
            }
    }
    std::vector<uint8_t> live_edge(b.edges.size(), 0);
    for (size_t ei = 0; ei < b.edges.size(); ei++) {
        if (b.removed[ei]) continue;
        const EdgeRec& e = b.edges[ei];
        live_edge[ei] = fwd[e.u] && bwd[e.u] && fwd[e.v] && bwd[e.v];
    }
    std::fill(ind.begin(), ind.end(), 0);
    std::fill(outd.begin(), outd.end(), 0);
    std::vector<int32_t> only_in(n, -1), only_out(n, -1);
    for (size_t ei = 0; ei < b.edges.size(); ei++) {
        if (!live_edge[ei]) continue;
        const EdgeRec& e = b.edges[ei];
        outd[e.u]++;
        ind[e.v]++;
        only_out[e.u] = (int32_t)ei;     // valid only when outd == 1
        only_in[e.v] = (int32_t)ei;
    }
    // chain starts (seq_graph.py from_kmer_graph is_start rule)
    std::vector<uint8_t> is_start(n, 0);
    for (int64_t v = 0; v < n; v++) {
        if (!outd[v] && !ind[v]) continue;   // not live
        if (ind[v] != 1) {
            is_start[v] = 1;
        } else {
            const int32_t p = b.edges[only_in[v]].u;
            if (outd[p] != 1 || p == v) is_start[v] = 1;
        }
    }
    const int k = b.k;
    int64_t nsv = 0, nse = 0, so = 0;
    std::vector<int32_t> vmap(n, -1);
    std::vector<int32_t> tails;
    // pass 1: walk chains in vertex order, emit sequences + vmap
    for (int64_t v = 0; v < n; v++) {
        if (!is_start[v] || (!outd[v] && !ind[v])) continue;
        const bool head_is_source = ind[v] == 0;
        const int64_t need = head_is_source ? k : 1;
        if (so + need > cap_z) return false;
        if (head_is_source) {
            std::memcpy(zseq + so, b.vertex_kmer[v], k);
            so += k;
        } else {
            zseq[so++] = b.vertex_kmer[v][k - 1];
        }
        vmap[v] = (int32_t)nsv;
        int32_t cur = (int32_t)v;
        while (outd[cur] == 1) {
            const int32_t t = b.edges[only_out[cur]].v;
            if (is_start[t] || t == (int32_t)v) break;
            if (so + 1 > cap_z) return false;
            zseq[so++] = b.vertex_kmer[t][k - 1];
            vmap[t] = (int32_t)nsv;
            cur = t;
        }
        tails.push_back(cur);
        zv_bounds[++nsv] = so;
        if (nsv >= cap_z) return false;
    }
    zv_bounds[0] = 0;
    // pass 2: inter-chain edges in (chain, creation) order
    for (const int32_t tail : tails) {
        for (const int32_t ei : b.out_adj[tail]) {
            if (!live_edge[ei]) continue;
            if (nse >= cap_z) return false;
            const EdgeRec& e = b.edges[ei];
            ze_u[nse] = vmap[tail];
            ze_v[nse] = vmap[e.v];
            ze_mult[nse] = e.mult;
            ze_ref[nse] = e.is_ref;
            nse++;
        }
    }
    zcounts[0] = nsv;
    zcounts[1] = nse;
    zcounts[2] = so;
    return true;
}

}  // namespace

// Extended builder: per-sample pruning multiplicities (sequences must arrive
// sample-grouped; `sample_ids` marks the grouping), Kahn cycle detection,
// and — when acyclic and prune_factor > 0 — low-weight chain pruning with
// orphan removal, all before any Python objects exist.
// out_counts = {n_vertices, n_edges, ref_path_len, has_cycle}.
extern "C" int graph_build2(
    const uint8_t* seq_buf, const int64_t* seq_off, const int32_t* counts,
    const uint8_t* is_ref, const int32_t* sample_ids, int64_t n_seqs, int k,
    int num_pruning_samples, int prune_factor, int start_only_at_existing,
    int64_t* vertex_kmer_off, int32_t* edge_u, int32_t* edge_v,
    int32_t* edge_mult, uint8_t* edge_is_ref, int32_t* edge_pm,
    int32_t* ref_path, int64_t cap, int64_t* out_counts) {
    Builder b;
    b.k = k;
    b.buf = seq_buf;
    b.nps = num_pruning_samples > 0 ? num_pruning_samples : 1;
    b.start_only_at_existing = start_only_at_existing != 0;
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
    for (int64_t s = 0; s < n_seqs; s++) {
        if (s > 0 && sample_ids[s] != sample_ids[s - 1]) b.flush_sample();
        b.thread(seq_buf + seq_off[s], seq_off[s + 1] - seq_off[s],
                 counts[s], is_ref[s] != 0);
    }
    b.flush_sample();

    const bool cycle = b.has_cycle();
    b.index_in_edges();
    if (!cycle) b.prune_low_weight_chains(prune_factor);

    const int64_t nv = (int64_t)b.vertex_kmer.size();
    const int64_t nr = (int64_t)b.ref_path.size();
    if (nv > cap || (int64_t)b.edges.size() > cap || nr > cap) return 1;
    for (int64_t i = 0; i < nv; i++)
        vertex_kmer_off[i] = b.vertex_kmer[i] - seq_buf;
    int64_t ne = 0;
    for (size_t ei = 0; ei < b.edges.size(); ei++) {
        if (b.removed[ei]) continue;
        const EdgeRec& e = b.edges[ei];
        edge_u[ne] = e.u;
        edge_v[ne] = e.v;
        edge_mult[ne] = e.mult;
        edge_is_ref[ne] = e.is_ref;
        edge_pm[ne] = b.pruning_mult(e);
        ne++;
    }
    for (int64_t i = 0; i < nr; i++) ref_path[i] = b.ref_path[i];
    out_counts[0] = nv;
    out_counts[1] = ne;
    out_counts[2] = nr;
    out_counts[3] = cycle ? 1 : 0;
    // low-complexity gate inputs (read_threading_graph.rs:261-263
    // is_low_quality_graph: non_unique * 4 > kmer_map)
    out_counts[4] = (int64_t)b.non_unique.size();
    out_counts[5] = (int64_t)b.kmer_to_vertex.size();
    return 0;
}

// graph_build2 + speculative seq-graph zip: when the pruned graph is
// acyclic and dangling-end recovery cannot apply (no non-ref dangling
// sinks/sources, or recovery disabled), the reachability filter
// (remove_paths_not_connected_to_ref) and the kmer->seq chain zip run here
// and the kmer graph is never handed to Python at all.
// out_counts adds [6]=zip_done, and zcounts = {n_seq_vertices, n_seq_edges,
// seq_bytes} describes the zip outputs when zip_done.
extern "C" int graph_build3(
    const uint8_t* seq_buf, const int64_t* seq_off, const int32_t* counts,
    const uint8_t* is_ref, const int32_t* sample_ids, int64_t n_seqs, int k,
    int num_pruning_samples, int prune_factor, int start_only_at_existing,
    int allow_zip, int recovery_on,
    int64_t* vertex_kmer_off, int32_t* edge_u, int32_t* edge_v,
    int32_t* edge_mult, uint8_t* edge_is_ref, int32_t* edge_pm,
    int32_t* ref_path, int64_t cap, int64_t* out_counts,
    uint8_t* zseq, int64_t* zv_bounds, int32_t* ze_u, int32_t* ze_v,
    int32_t* ze_mult, uint8_t* ze_ref, int64_t cap_z, int64_t* zcounts) {
    Builder b;
    b.k = k;
    b.buf = seq_buf;
    b.nps = num_pruning_samples > 0 ? num_pruning_samples : 1;
    b.start_only_at_existing = start_only_at_existing != 0;
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
    for (int64_t s = 0; s < n_seqs; s++) {
        if (s > 0 && sample_ids[s] != sample_ids[s - 1]) b.flush_sample();
        b.thread(seq_buf + seq_off[s], seq_off[s + 1] - seq_off[s],
                 counts[s], is_ref[s] != 0);
    }
    b.flush_sample();

    const bool cycle = b.has_cycle();
    b.index_in_edges();
    if (!cycle) b.prune_low_weight_chains(prune_factor);

    const int64_t nv = (int64_t)b.vertex_kmer.size();
    const int64_t nr = (int64_t)b.ref_path.size();
    if (nv > cap || (int64_t)b.edges.size() > cap || nr > cap) return 1;
    out_counts[0] = nv;
    out_counts[2] = nr;
    out_counts[3] = cycle ? 1 : 0;
    out_counts[4] = (int64_t)b.non_unique.size();
    out_counts[5] = (int64_t)b.kmer_to_vertex.size();
    out_counts[6] = 0;
    for (int64_t i = 0; i < nr; i++) ref_path[i] = b.ref_path[i];

    if (allow_zip && !cycle &&
        try_zip(b, recovery_on != 0, cap_z, zseq, zv_bounds, ze_u, ze_v,
                ze_mult, ze_ref, zcounts)) {
        // zip succeeded: Python only needs the gates + the seq graph
        out_counts[1] = 0;
        out_counts[6] = 1;
        return 0;
    }

    for (int64_t i = 0; i < nv; i++)
        vertex_kmer_off[i] = b.vertex_kmer[i] - seq_buf;
    int64_t ne = 0;
    for (size_t ei = 0; ei < b.edges.size(); ei++) {
        if (b.removed[ei]) continue;
        const EdgeRec& e = b.edges[ei];
        edge_u[ne] = e.u;
        edge_v[ne] = e.v;
        edge_mult[ne] = e.mult;
        edge_is_ref[ne] = e.is_ref;
        edge_pm[ne] = b.pruning_mult(e);
        ne++;
    }
    out_counts[1] = ne;
    return 0;
}
