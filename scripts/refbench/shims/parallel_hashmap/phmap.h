// Minimal parallel-hashmap shim: just the parallel_flat_hash_map interface
// the Pies reference uses (hash / subidx / subcnt / find-with-hash /
// emplace_with_hash / clear), implemented as 64 std::unordered_map submaps.
// The reference's parallelBulkInsert routes each key to exactly one thread
// via subidx ownership, so per-submap access is single-threaded by
// construction and no locking is required — same contract as real phmap's
// example pattern.  Measurement aid only; original code.
#pragma once

#include <cstddef>
#include <functional>
#include <unordered_map>
#include <utility>

namespace phmap {

template <class K, class V, class Hash = std::hash<K>>
class parallel_flat_hash_map {
 public:
  static constexpr std::size_t kNumSubmaps = 64;  // power of two, >= 16
  using submap_t = std::unordered_map<K, V, Hash>;
  using iterator = typename submap_t::iterator;
  using const_iterator = typename submap_t::const_iterator;

  std::size_t hash(const K& key) const { return Hash{}(key); }
  std::size_t subcnt() const { return kNumSubmaps; }
  std::size_t subidx(std::size_t hashval) const {
    // Real phmap picks the submap from high-order hash bits; any consistent
    // mapping works for the reference's ownership scheme.
    return (hashval >> 7) & (kNumSubmaps - 1);
  }

  iterator find(const K& key, std::size_t hashval) {
    auto& sub = subs_[subidx(hashval)];
    auto it = sub.find(key);
    return it == sub.end() ? end_ : it;
  }
  const_iterator find(const K& key, std::size_t hashval) const {
    const auto& sub = subs_[subidx(hashval)];
    auto it = sub.find(key);
    return it == sub.end() ? cend_ : it;
  }
  iterator end() { return end_; }
  const_iterator end() const { return cend_; }

  template <class Pair>
  std::pair<iterator, bool> emplace_with_hash(std::size_t hashval, Pair&& p) {
    return subs_[subidx(hashval)].emplace(std::forward<Pair>(p));
  }

  void clear() {
    for (auto& sub : subs_) sub.clear();
  }

 private:
  submap_t subs_[kNumSubmaps];
  // A dedicated always-empty map supplies the universal end() sentinel so
  // find() across submaps can be compared against a single end().
  submap_t empty_;
  iterator end_ = empty_.end();
  const_iterator cend_ = empty_.cend();
};

}  // namespace phmap
