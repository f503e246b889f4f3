// mergenet_tpu native merge decoder.
//
// Greedy agglomerative instance-segmentation decode: start from per-pixel
// objects, repeatedly merge the object pair with the best (non-negative)
// log-likelihood-gain priority until none remains.
//
// This is a ground-up re-design of the reference decoder
// (reference: utils/csegment/segment.{h,cc}).  Differences in engineering
// (same algorithm/objective):
//   * pixels are tracked by a union-find array, not per-object hash sets;
//     a merge moves O(1) pixel state and the output mask is one find() pass.
//   * objects live in flat arrays indexed by union-find root (size, class
//     logprobs, best class) — no per-object heap allocations.
//   * adjacency records live in one arena vector; each live root keeps an
//     unordered_map<neighbor_root, record_index>.
//   * the priority queue stores (priority, record_index); staleness is
//     detected by comparing the popped priority to the record's current
//     priority (exact float equality, as in the reference).
//
// Both reference priority semantics are supported (see segmenter.py /
// SURVEY.md section 2.1): den_mode 0 = 'sum' (priority = (oml*f + cdl)/
// (n1+n2) + bias; merge on recompute == popped) matching segment.cc:145-150,
// and den_mode 1 = 'product' ((oml*f + cdl + bias)/(n1*n2); merge on
// recompute >= popped) matching segmenter.py:189-193.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC segment.cc -o libmergenet_segment.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <limits>
#include <queue>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

using std::size_t;

struct Options {
  float same_different_bias = 0.0f;
  float object_merge_factor = 1.0f;
  float merge_logprob_bias = 0.0f;
  int den_mode = 0;      // 0 = sum (+bias outside), 1 = product (bias inside)
  int remerge_mode = 0;  // 0 = merge on ==, 1 = merge on >=
  int do_prune = 1;
  float prune_threshold = 200.0f;
};

struct Record {
  double oml;   // sum over linking (pixel,offset) pairs of log(b/(1-b))
  double same;  // sum of log(b)
  double diff;  // sum of log(1-b)
  double pri;   // current merge priority
  int32_t a, b;  // live roots (a < b), or -1 when dead
};

class Segmenter {
 public:
  Segmenter(const float* class_probs, int num_classes,
            const float* sameness_probs, int num_offsets,
            int height, int width, const int* offsets, const Options& opts)
      : C_(num_classes), O_(num_offsets), H_(height), W_(width),
        N_(static_cast<int64_t>(height) * width), opts_(opts) {
    offsets_.assign(offsets, offsets + 2 * num_offsets);

    const double eps = 1.1920929e-07;  // float32 machine epsilon
    // per-pixel class logprobs, (N, C) layout for cache-friendly row access
    cls_lp_.resize(N_ * C_);
    for (int c = 0; c < C_; ++c) {
      const float* src = class_probs + static_cast<int64_t>(c) * N_;
      for (int64_t p = 0; p < N_; ++p) {
        double v = src[p];
        v = std::min(std::max(v, eps), 1.0 - eps);
        cls_lp_[p * C_ + c] = std::log(v);
      }
    }
    // per-(offset,pixel) log-same / log-diff
    log_same_.resize(static_cast<int64_t>(O_) * N_);
    log_diff_.resize(static_cast<int64_t>(O_) * N_);
    for (int o = 0; o < O_; ++o) {
      const float* src = sameness_probs + static_cast<int64_t>(o) * N_;
      double* ls = log_same_.data() + static_cast<int64_t>(o) * N_;
      double* ld = log_diff_.data() + static_cast<int64_t>(o) * N_;
      const double sdb = opts_.same_different_bias;
      for (int64_t p = 0; p < N_; ++p) {
        double v = src[p];
        v = std::min(std::max(v, eps), 1.0 - eps);
        if (sdb != 0.0) {
          double logit = std::log(v) - std::log1p(-v) + sdb;
          v = 1.0 / (1.0 + std::exp(-logit));
          v = std::min(std::max(v, eps), 1.0 - eps);
        }
        ls[p] = std::log(v);
        ld[p] = std::log1p(-v);
      }
    }

    parent_.resize(N_);
    for (int64_t i = 0; i < N_; ++i) parent_[i] = static_cast<int32_t>(i);
    obj_size_.assign(N_, 1);
    obj_cls_lp_ = cls_lp_;  // per-root accumulators start as per-pixel
    obj_class_.resize(N_);
    obj_best_.resize(N_);
    for (int64_t p = 0; p < N_; ++p) {
      const double* row = &obj_cls_lp_[p * C_];
      int best = 0;
      for (int c = 1; c < C_; ++c)
        if (row[c] > row[best]) best = c;
      obj_class_[p] = best;
      obj_best_[p] = row[best];
    }
    adj_.resize(N_);
    n_alive_ = N_;

    init_records();
  }

  void run() {
    while (!queue_.empty()) {
      auto top = queue_.top();
      queue_.pop();
      double popped = top.first;
      int32_t ri = top.second;
      Record& r = records_[ri];
      if (r.a < 0 || r.pri != popped) continue;  // dead or stale
      int merged_class;
      double new_pri = compute_priority(r, &merged_class);
      r.pri = new_pri;
      bool do_merge = opts_.remerge_mode == 0 ? (new_pri == popped)
                                              : (new_pri >= popped);
      if (do_merge) {
        merge(ri, merged_class);
      } else if (new_pri >= 0.0) {
        queue_.push({new_pri, ri});
      }
    }
    if (opts_.do_prune) prune(opts_.prune_threshold);
  }

  // Writes instance ids 1..K into mask (H*W int32, 0 = background) and the
  // per-instance class into object_class (terminated by -1).
  void output(int32_t* mask, int32_t* object_class) {
    std::vector<int32_t> inst(N_, 0);
    int32_t k = 1;
    for (int64_t r = 0; r < N_; ++r) {
      if (parent_[r] == r && obj_class_[r] != 0) {
        inst[r] = k;
        object_class[k - 1] = obj_class_[r];
        ++k;
      }
    }
    object_class[k - 1] = -1;
    for (int64_t p = 0; p < N_; ++p) mask[p] = inst[find(static_cast<int32_t>(p))];
  }

  double total_logprob() {
    double tot_class = 0.0, tot_same = 0.0, tot_diff = 0.0;
    for (int64_t r = 0; r < N_; ++r) {
      if (parent_[r] != r) continue;
      tot_class += obj_best_[r];
      tot_same += obj_sameness_.count(static_cast<int32_t>(r))
                      ? obj_sameness_[static_cast<int32_t>(r)] : 0.0;
    }
    for (const Record& rec : records_)
      if (rec.a >= 0) tot_diff += rec.diff;
    return tot_class + (tot_same + tot_diff) * opts_.object_merge_factor;
  }

 private:
  void init_records() {
    // Each in-bounds (pixel, offset) pair is one initial record: offsets are
    // unique and never negated pairs, so each unordered pixel pair appears
    // at most once.
    records_.reserve(static_cast<size_t>(N_) * O_);
    for (int o = 0; o < O_; ++o) {
      const int di = offsets_[2 * o], dj = offsets_[2 * o + 1];
      const double* ls = log_same_.data() + static_cast<int64_t>(o) * N_;
      const double* ld = log_diff_.data() + static_cast<int64_t>(o) * N_;
      for (int row = 0; row < H_; ++row) {
        const int r2 = row + di;
        if (r2 < 0 || r2 >= H_) continue;
        for (int col = 0; col < W_; ++col) {
          const int c2 = col + dj;
          if (c2 < 0 || c2 >= W_) continue;
          const int32_t p = row * W_ + col;
          const int32_t q = r2 * W_ + c2;
          Record rec;
          rec.same = ls[p];
          rec.diff = ld[p];
          rec.oml = rec.same - rec.diff;
          rec.a = std::min(p, q);
          rec.b = std::max(p, q);
          int merged_class;
          rec.pri = compute_priority(rec, &merged_class);
          int32_t ri = static_cast<int32_t>(records_.size());
          records_.push_back(rec);
          adj_[rec.a].emplace(rec.b, ri);
          adj_[rec.b].emplace(rec.a, ri);
          if (rec.pri >= 0.0) queue_.push({rec.pri, ri});
        }
      }
    }
  }

  inline int32_t find(int32_t x) {
    int32_t root = x;
    while (parent_[root] != root) root = parent_[root];
    while (parent_[x] != root) {
      int32_t next = parent_[x];
      parent_[x] = root;
      x = next;
    }
    return root;
  }

  double compute_priority(const Record& r, int* merged_class) {
    const int32_t a = r.a, b = r.b;
    double cdl;
    if (obj_class_[a] == obj_class_[b]) {
      cdl = 0.0;
      *merged_class = obj_class_[a];
    } else {
      const double* ra = &obj_cls_lp_[static_cast<int64_t>(a) * C_];
      const double* rb = &obj_cls_lp_[static_cast<int64_t>(b) * C_];
      int best = 0;
      double best_v = ra[0] + rb[0];
      for (int c = 1; c < C_; ++c) {
        double v = ra[c] + rb[c];
        if (v > best_v) { best_v = v; best = c; }
      }
      *merged_class = best;
      cdl = best_v - obj_best_[a] - obj_best_[b];
    }
    const double f = opts_.object_merge_factor;
    const double bias = opts_.merge_logprob_bias;
    const double n1 = static_cast<double>(obj_size_[a]);
    const double n2 = static_cast<double>(obj_size_[b]);
    if (opts_.den_mode == 0) return (r.oml * f + cdl) / (n1 + n2) + bias;
    return (r.oml * f + cdl + bias) / (n1 * n2);
  }

  void merge(int32_t ri, int merged_class) {
    Record rec = records_[ri];
    int32_t a = rec.a, b = rec.b;
    if (obj_size_[b] > obj_size_[a]) std::swap(a, b);  // b dies

    records_[ri].a = records_[ri].b = -1;  // kill the merging record
    adj_[a].erase(b);
    adj_[b].erase(a);

    obj_class_[a] = merged_class;
    obj_size_[a] += obj_size_[b];
    {
      double* ra = &obj_cls_lp_[static_cast<int64_t>(a) * C_];
      const double* rb = &obj_cls_lp_[static_cast<int64_t>(b) * C_];
      for (int c = 0; c < C_; ++c) ra[c] += rb[c];
      obj_best_[a] = ra[merged_class];
    }
    obj_sameness_[a] += rec.same + get_sameness(b);
    parent_[b] = a;
    --n_alive_;

    // re-point b's records at a, coalescing with existing (a, c) records
    for (auto& kv : adj_[b]) {
      const int32_t c = kv.first;
      const int32_t old_ri = kv.second;
      Record& old_rec = records_[old_ri];
      adj_[c].erase(b);
      auto it = adj_[a].find(c);
      int32_t live_ri;
      if (it != adj_[a].end()) {
        Record& keep = records_[it->second];
        keep.oml += old_rec.oml;
        keep.same += old_rec.same;
        keep.diff += old_rec.diff;
        old_rec.a = old_rec.b = -1;  // tombstone
        live_ri = it->second;
      } else {
        old_rec.a = std::min(a, c);
        old_rec.b = std::max(a, c);
        adj_[a].emplace(c, old_ri);
        adj_[c].emplace(a, old_ri);
        live_ri = old_ri;
      }
      Record& live = records_[live_ri];
      int mc;
      live.pri = compute_priority(live, &mc);
      if (live.pri >= 0.0) queue_.push({live.pri, live_ri});
    }
    adj_[b].clear();
  }

  double get_sameness(int32_t r) {
    auto it = obj_sameness_.find(r);
    return it == obj_sameness_.end() ? 0.0 : it->second;
  }

  void prune(float threshold) {
    int32_t bg = -1;
    int64_t bg_size = -1;
    for (int64_t r = 0; r < N_; ++r) {
      if (parent_[r] != r) continue;
      if (obj_class_[r] == 0 && obj_size_[r] > bg_size) {
        bg = static_cast<int32_t>(r);
        bg_size = obj_size_[r];
      }
    }
    if (bg < 0) return;
    for (int64_t r = 0; r < N_; ++r) {
      if (parent_[r] != r || r == bg) continue;
      double advantage = obj_best_[r] - obj_cls_lp_[r * C_ + 0];
      if (advantage < threshold) {
        parent_[r] = bg;
        obj_size_[bg] += obj_size_[r];
        --n_alive_;
      }
    }
  }

  const int C_, O_, H_, W_;
  const int64_t N_;
  const Options opts_;
  std::vector<int> offsets_;

  std::vector<double> cls_lp_;       // (N, C)
  std::vector<double> log_same_;     // (O, N)
  std::vector<double> log_diff_;     // (O, N)

  std::vector<int32_t> parent_;      // union-find
  std::vector<int64_t> obj_size_;
  std::vector<double> obj_cls_lp_;   // (N, C) per-root accumulators
  std::vector<int> obj_class_;
  std::vector<double> obj_best_;
  std::unordered_map<int32_t, double> obj_sameness_;
  int64_t n_alive_;

  std::vector<Record> records_;
  std::vector<std::unordered_map<int32_t, int32_t>> adj_;
  std::priority_queue<std::pair<double, int32_t>> queue_;
};

void run_one(const float* class_pred, int num_classes,
             const float* adj_pred, int num_offsets,
             int height, int width, const int* offset_list,
             int32_t* mask_out, int32_t* object_class_out,
             const Options& opts) {
  Segmenter seg(class_pred, num_classes, adj_pred, num_offsets,
                height, width, offset_list, opts);
  seg.run();
  seg.output(mask_out, object_class_out);
}

}  // namespace

extern "C" {

// Extended entry point with full option control.
void mn_run_segmentation(const float* class_pred, int num_classes,
                         const float* adj_pred, int num_offsets,
                         int height, int width, const int* offset_list,
                         int32_t* mask_out, int32_t* object_class_out,
                         float same_different_bias, float object_merge_factor,
                         float merge_logprob_bias, int den_mode,
                         int remerge_mode, int do_prune,
                         float prune_threshold) {
  Options opts;
  opts.same_different_bias = same_different_bias;
  opts.object_merge_factor = object_merge_factor;
  opts.merge_logprob_bias = merge_logprob_bias;
  opts.den_mode = den_mode;
  opts.remerge_mode = remerge_mode;
  opts.do_prune = do_prune;
  opts.prune_threshold = prune_threshold;
  run_one(class_pred, num_classes, adj_pred, num_offsets, height, width,
          offset_list, mask_out, object_class_out, opts);
}

// Batched decode: arrays have a leading batch dimension; each image decodes
// on its own thread (throughput path for multi-core hosts).
void mn_run_segmentation_batch(const float* class_pred, int num_classes,
                               const float* adj_pred, int num_offsets,
                               int batch, int height, int width,
                               const int* offset_list, int32_t* mask_out,
                               int32_t* object_class_out,
                               float same_different_bias,
                               float object_merge_factor,
                               float merge_logprob_bias, int den_mode,
                               int remerge_mode, int do_prune,
                               float prune_threshold, int num_threads) {
  Options opts;
  opts.same_different_bias = same_different_bias;
  opts.object_merge_factor = object_merge_factor;
  opts.merge_logprob_bias = merge_logprob_bias;
  opts.den_mode = den_mode;
  opts.remerge_mode = remerge_mode;
  opts.do_prune = do_prune;
  opts.prune_threshold = prune_threshold;

  const int64_t hw = static_cast<int64_t>(height) * width;
  if (num_threads <= 0)
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
  num_threads = std::max(1, std::min(num_threads, batch));

  std::vector<std::thread> pool;
  // static partition: thread t handles images t, t+T, t+2T, ...
  for (int t = 0; t < num_threads; ++t) {
    pool.emplace_back([&, t]() {
      for (int i = t; i < batch; i += num_threads) {
        run_one(class_pred + i * hw * num_classes, num_classes,
                adj_pred + i * hw * num_offsets, num_offsets, height, width,
                offset_list, mask_out + i * hw, object_class_out + i * hw,
                opts);
      }
    });
  }
  for (auto& th : pool) th.join();
}

}  // extern "C"
