// Native runtime core for the TPU serving engine: paged-KV block allocator
// and continuous-batching admission scheduler.
//
// The reference implements its host runtime in C++ (flash_api.cpp's dispatch
// layer); this is the analogous native layer for the serving engine: the
// page allocator and scheduler run on the host critical path once per decode
// step, so they are implemented in C++ behind a C ABI (consumed from Python
// via ctypes -- no pybind11 dependency).
//
// Design:
//  * PageAllocator: O(1) alloc/free via a free-list stack over a fixed pool
//    of HBM pages. Each sequence owns a page list; growing a sequence by one
//    token allocates a page only at page_size boundaries.
//  * Scheduler: FCFS admission with page-budget backpressure: a waiting
//    request is admitted when its prompt's pages plus a reserve fit in the
//    free pool. Running sequences are preempted (last-in) if a decode step
//    cannot allocate.
//
// All functions are thread-compatible but not thread-safe; the engine calls
// them from a single Python thread.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Sequence {
  std::vector<int32_t> pages;
  int32_t length = 0;   // tokens currently stored
  bool live = false;
};

struct Runtime {
  int32_t total_pages = 0;
  int32_t page_size = 0;
  std::vector<int32_t> free_list;       // stack of free page ids
  std::vector<int32_t> ref;             // per-page refcount (0 = on free_list)
  std::vector<Sequence> seqs;           // slot id -> sequence
  std::vector<int32_t> free_slots;      // stack of free slot ids
};

int32_t pages_for(const Runtime* rt, int32_t tokens) {
  return (tokens + rt->page_size - 1) / rt->page_size;
}

bool bad_slot(const Runtime* rt, int32_t slot) {
  return slot < 0 || slot >= static_cast<int32_t>(rt->seqs.size()) ||
         !rt->seqs[slot].live;
}

bool bad_page(const Runtime* rt, int32_t page) {
  return page < 0 || page >= rt->total_pages;
}

// Every page release goes through here: prefix caching shares prompt pages
// across sequences (and pins them from the engine's content-hash registry),
// so a page returns to the free list only when its LAST reference drops.
void release_page(Runtime* rt, int32_t page) {
  if (page < 0) return;  // window hole
  if (--rt->ref[page] == 0) rt->free_list.push_back(page);
}

int32_t take_page(Runtime* rt) {
  int32_t p = rt->free_list.back();
  rt->free_list.pop_back();
  rt->ref[p] = 1;
  return p;
}

}  // namespace

extern "C" {

// Create a runtime managing `total_pages` pages of `page_size` tokens with
// capacity for `max_seqs` concurrent sequences. Returns an opaque handle.
void* fat_runtime_create(int32_t total_pages, int32_t page_size,
                         int32_t max_seqs) {
  auto* rt = new Runtime();
  rt->total_pages = total_pages;
  rt->page_size = page_size;
  rt->free_list.reserve(total_pages);
  for (int32_t i = total_pages - 1; i >= 0; --i) rt->free_list.push_back(i);
  rt->ref.assign(total_pages, 0);
  rt->seqs.resize(max_seqs);
  rt->free_slots.reserve(max_seqs);
  for (int32_t i = max_seqs - 1; i >= 0; --i) rt->free_slots.push_back(i);
  return rt;
}

void fat_runtime_destroy(void* h) { delete static_cast<Runtime*>(h); }

int32_t fat_free_pages(void* h) {
  return static_cast<int32_t>(static_cast<Runtime*>(h)->free_list.size());
}

// Allocate a sequence slot holding `prompt_tokens` tokens, with the first
// `live_from_page` positional table entries left as holes (-1) — the
// sliding-window case where those tokens' KV will never be read, so no
// physical page is spent on them. Returns the slot id, or -1 if no slot /
// not enough pages (nothing is allocated on failure).
int32_t fat_seq_alloc_windowed(void* h, int32_t prompt_tokens,
                               int32_t live_from_page) {
  auto* rt = static_cast<Runtime*>(h);
  if (rt->free_slots.empty()) return -1;
  int32_t total = pages_for(rt, prompt_tokens);
  if (live_from_page < 0) live_from_page = 0;
  if (live_from_page > total) live_from_page = total;
  int32_t need = total - live_from_page;
  if (need > static_cast<int32_t>(rt->free_list.size())) return -1;
  int32_t slot = rt->free_slots.back();
  rt->free_slots.pop_back();
  Sequence& s = rt->seqs[slot];
  s.pages.clear();
  s.length = prompt_tokens;
  s.live = true;
  for (int32_t i = 0; i < live_from_page; ++i) s.pages.push_back(-1);
  for (int32_t i = 0; i < need; ++i) s.pages.push_back(take_page(rt));
  return slot;
}

int32_t fat_seq_alloc(void* h, int32_t prompt_tokens) {
  return fat_seq_alloc_windowed(h, prompt_tokens, 0);
}

// Free the physical pages behind the first `upto_page` positional table
// entries (sliding window moved past them); the entries become holes (-1)
// so the table stays positional. Idempotent. Returns pages actually freed.
int32_t fat_seq_release_prefix(void* h, int32_t slot, int32_t upto_page) {
  auto* rt = static_cast<Runtime*>(h);
  if (bad_slot(rt, slot)) return -1;
  Sequence& s = rt->seqs[slot];
  if (upto_page > static_cast<int32_t>(s.pages.size()))
    upto_page = static_cast<int32_t>(s.pages.size());
  int32_t freed = 0;
  for (int32_t i = 0; i < upto_page; ++i) {
    if (s.pages[i] >= 0) {
      release_page(rt, s.pages[i]);
      s.pages[i] = -1;
      ++freed;
    }
  }
  return freed;
}

// Grow a sequence by one token. Returns 0 on success, -1 if a new page was
// needed but the pool is exhausted (caller should preempt).
int32_t fat_seq_append(void* h, int32_t slot) {
  auto* rt = static_cast<Runtime*>(h);
  if (bad_slot(rt, slot)) return -1;
  Sequence& s = rt->seqs[slot];
  int32_t need = pages_for(rt, s.length + 1);
  if (need > static_cast<int32_t>(s.pages.size())) {
    if (rt->free_list.empty()) return -1;
    s.pages.push_back(take_page(rt));
  }
  s.length += 1;
  return 0;
}

// Shrink a sequence to `new_length` tokens, freeing whole tail pages past
// the new boundary (speculative decoding reserves the maximum-acceptance
// length up front and returns the unused tail here). Growing is rejected.
// Returns pages freed, or -1 on a bad slot / length.
int32_t fat_seq_truncate(void* h, int32_t slot, int32_t new_length) {
  auto* rt = static_cast<Runtime*>(h);
  if (bad_slot(rt, slot)) return -1;
  Sequence& s = rt->seqs[slot];
  if (new_length < 0 || new_length > s.length) return -1;
  int32_t keep = pages_for(rt, new_length);
  int32_t freed = 0;
  while (static_cast<int32_t>(s.pages.size()) > keep) {
    if (s.pages.back() >= 0) {
      release_page(rt, s.pages.back());
      ++freed;
    }
    s.pages.pop_back();
  }
  s.length = new_length;
  return freed;
}

// Release a sequence's pages and slot.
void fat_seq_free(void* h, int32_t slot) {
  auto* rt = static_cast<Runtime*>(h);
  if (bad_slot(rt, slot)) return;
  Sequence& s = rt->seqs[slot];
  for (int32_t p : s.pages)
    release_page(rt, p);  // skips window holes; frees on last reference
  s.pages.clear();
  s.length = 0;
  s.live = false;
  rt->free_slots.push_back(slot);
}

int32_t fat_seq_length(void* h, int32_t slot) {
  auto* rt = static_cast<Runtime*>(h);
  return bad_slot(rt, slot) ? -1 : rt->seqs[slot].length;
}

int32_t fat_seq_num_pages(void* h, int32_t slot) {
  auto* rt = static_cast<Runtime*>(h);
  return bad_slot(rt, slot)
             ? -1
             : static_cast<int32_t>(rt->seqs[slot].pages.size());
}

// Copy the sequence's page ids into `out` (caller-sized >= num_pages, padded
// with `pad` up to out_len). Returns num real pages.
int32_t fat_seq_page_table(void* h, int32_t slot, int32_t* out,
                           int32_t out_len, int32_t pad) {
  auto* rt = static_cast<Runtime*>(h);
  if (bad_slot(rt, slot)) {
    for (int32_t i = 0; i < out_len; ++i) out[i] = pad;
    return -1;
  }
  const Sequence& s = rt->seqs[slot];
  int32_t n = static_cast<int32_t>(s.pages.size());
  int32_t i = 0;
  // window holes (released/never-allocated prefix pages) also read as `pad`
  for (; i < n && i < out_len; ++i) out[i] = s.pages[i] >= 0 ? s.pages[i] : pad;
  for (; i < out_len; ++i) out[i] = pad;
  return n;
}

// Allocate a sequence whose first `n_shared` pages ADOPT the given already-
// live pages (prefix caching: another sequence / the engine's prefix
// registry holds them and their KV is valid for this prompt's prefix). The
// adopted pages are re-referenced, not copied; only the remaining
// pages_for(prompt_tokens) - n_shared pages are newly allocated. Returns the
// slot id, or -1 (nothing touched) on: no free slot, not enough free pages,
// a shared page id out of range or not currently referenced (adopting a
// FREE page would hand out a page the allocator still owns), or n_shared
// exceeding the prompt's page count.
int32_t fat_seq_alloc_prefixed(void* h, int32_t prompt_tokens,
                               const int32_t* shared, int32_t n_shared) {
  auto* rt = static_cast<Runtime*>(h);
  if (rt->free_slots.empty()) return -1;
  int32_t total = pages_for(rt, prompt_tokens);
  if (n_shared < 0 || n_shared > total) return -1;
  for (int32_t i = 0; i < n_shared; ++i)
    if (bad_page(rt, shared[i]) || rt->ref[shared[i]] <= 0) return -1;
  int32_t need = total - n_shared;
  if (need > static_cast<int32_t>(rt->free_list.size())) return -1;
  int32_t slot = rt->free_slots.back();
  rt->free_slots.pop_back();
  Sequence& s = rt->seqs[slot];
  s.pages.clear();
  s.length = prompt_tokens;
  s.live = true;
  for (int32_t i = 0; i < n_shared; ++i) {
    ++rt->ref[shared[i]];
    s.pages.push_back(shared[i]);
  }
  for (int32_t i = 0; i < need; ++i) s.pages.push_back(take_page(rt));
  return slot;
}

// Pin a live page (the prefix registry takes a reference so the page — and
// its KV — outlives the sequences using it). Refuses free pages: pinning
// what the allocator owns would corrupt the free list. Returns 0 / -1.
int32_t fat_page_pin(void* h, int32_t page) {
  auto* rt = static_cast<Runtime*>(h);
  if (bad_page(rt, page) || rt->ref[page] <= 0) return -1;
  ++rt->ref[page];
  return 0;
}

// Drop a pin (registry eviction). The page frees when no sequence holds it.
int32_t fat_page_unpin(void* h, int32_t page) {
  auto* rt = static_cast<Runtime*>(h);
  if (bad_page(rt, page) || rt->ref[page] <= 0) return -1;
  release_page(rt, page);
  return 0;
}

// Current reference count (tests / debugging). -1 on a bad page id.
int32_t fat_page_refcount(void* h, int32_t page) {
  auto* rt = static_cast<Runtime*>(h);
  return bad_page(rt, page) ? -1 : rt->ref[page];
}

// Admission check used by the continuous-batching scheduler: would a prompt
// of `prompt_tokens` fit right now, keeping `reserve_pages` in the pool for
// running sequences to grow into?
int32_t fat_can_admit(void* h, int32_t prompt_tokens, int32_t reserve_pages) {
  auto* rt = static_cast<Runtime*>(h);
  if (rt->free_slots.empty()) return 0;
  int32_t need = pages_for(rt, prompt_tokens);
  return (need + reserve_pages <=
          static_cast<int32_t>(rt->free_list.size()))
             ? 1
             : 0;
}

// Windowed admission: only the pages from `live_from_page` on are physical
// (the prefix would be allocated as holes by fat_seq_alloc_windowed).
int32_t fat_can_admit_windowed(void* h, int32_t prompt_tokens,
                               int32_t live_from_page, int32_t reserve_pages) {
  auto* rt = static_cast<Runtime*>(h);
  if (rt->free_slots.empty()) return 0;
  int32_t need = pages_for(rt, prompt_tokens) - live_from_page;
  if (need < 0) need = 0;
  return (need + reserve_pages <=
          static_cast<int32_t>(rt->free_list.size()))
             ? 1
             : 0;
}

}  // extern "C"
