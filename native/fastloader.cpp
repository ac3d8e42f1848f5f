// fastloader — native data-loader core for vdm4cdm_tpu.
//
// One-pass periodic-wraparound crop + log10-normalize + flip + axis-permute
// over mmap'd float32 grid stacks, multithreaded across batch samples.
//
// The reference's data path (torch DataLoader with 16 worker processes,
// reference trainVDM3D_c_c_from_field_name_thick_lowbatch.py:73) materializes
// several intermediates per sample (crop copy, log copy, normalize copy, flip
// copy, permute copy) in Python. At 256^3 that is ~5 x 64 MB of traffic per
// sample per step. This kernel fuses the whole transform into a single gather
// + fma pass and writes the final block once — directly in the TPU feed
// layout (channels-last) if requested.
//
// Semantics exactly match vdm4cdm_tpu/data/transforms.py (tested in
// tests/test_native_loader.py):
//   cropped[i] = src[(anchor + i) mod full]          (periodic crop)
//   flipped    = np.flip(cropped, axes=F)
//   out        = np.transpose(flipped, axes=perm)    (spatial axes)
//   value      = (log10(x + alpha) - mean) / std
//
// Channels live in separate stacks (one mmap per field file, as in the data
// registries), passed as an array of base pointers. C ABI for ctypes.

#include <fcntl.h>
#include <unistd.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline int64_t wrap(int64_t v, int64_t n) {
  int64_t m = v % n;
  return m < 0 ? m + n : m;
}

struct AxisMap {
  int src_axis[3];
  int flip[3];
  int64_t anchor[3];
};

AxisMap make_axis_map(const int64_t* anchor, const int32_t* flips,
                      const int32_t* perm, int nd) {
  AxisMap m;
  for (int d = 0; d < 3; ++d) {
    m.src_axis[d] = d;
    m.flip[d] = 0;
    m.anchor[d] = 0;
  }
  for (int d = 0; d < nd; ++d) {
    if (perm) m.src_axis[d] = perm[d];
    if (flips) m.flip[d] = flips[d];
    if (anchor) m.anchor[d] = anchor[d];
  }
  return m;
}

// Index table for output position p: out[i0,..,ip,..] reads source axis
// sa = perm[p] (numpy transpose semantics: w = transpose(z, perm) has w's
// axis p equal to z's axis perm[p]). The table folds the anchor shift and
// flip of that source axis AND its memory stride, so the gather address is
// simply idx0[i] + idx1[j] (+ idx2[k]).
void build_idx(const AxisMap& m, int64_t crop, int64_t full, int p, int nd,
               std::vector<int64_t>& out) {
  out.resize(crop);
  const int sa = m.src_axis[p];
  int64_t stride = 1;
  for (int d = sa + 1; d < nd; ++d) stride *= full;
  for (int64_t i = 0; i < crop; ++i) {
    int64_t ci = m.flip[sa] ? (crop - 1 - i) : i;
    out[i] = wrap(m.anchor[sa] + ci, full) * stride;
  }
}

}  // namespace

extern "C" {

// 3D batched gather.
//   stacks:  nchan pointers, each to (nsims, full, full, full) float32
//   out:     (batch, crop^3, nchan) if channels_last else (batch, nchan, crop^3)
//   sim_idx: (batch,) int64; anchors (batch, 3) int64; flips/perms (batch, 3) int32
//   alphas/means/stds: (nchan,) float32 or NULL to skip normalization
void fastloader_crop3d_batch(const float* const* stacks, int nchan,
                             int64_t full, const int64_t* sim_idx,
                             const int64_t* anchors, const int32_t* flips,
                             const int32_t* perms, float* out, int64_t batch,
                             int64_t crop, const float* alphas,
                             const float* means, const float* stds,
                             int normalize, int channels_last, int nthreads) {
  if (nthreads <= 0) nthreads = (int)std::thread::hardware_concurrency();
  if (nthreads > batch * nchan) nthreads = (int)(batch * nchan);
  if (nthreads < 1) nthreads = 1;
  const int64_t full2 = full * full;
  const int64_t full3 = full2 * full;
  const int64_t crop2 = crop * crop;
  const int64_t crop3 = crop2 * crop;
  const int64_t sample_out = (int64_t)nchan * crop3;
  const int64_t chan_stride = channels_last ? 1 : crop3;
  const int64_t es = channels_last ? nchan : 1;

  std::atomic<int64_t> next(0);
  const int64_t n_tasks = batch * nchan;
  auto worker = [&]() {
    std::vector<int64_t> idx0, idx1, idx2;
    int64_t last_b = -1;
    AxisMap m{};
    for (;;) {
      int64_t task = next.fetch_add(1);
      if (task >= n_tasks) return;
      const int64_t b = task / nchan;
      const int c = (int)(task % nchan);
      if (b != last_b) {
        m = make_axis_map(anchors ? anchors + 3 * b : nullptr,
                          flips ? flips + 3 * b : nullptr,
                          perms ? perms + 3 * b : nullptr, 3);
        build_idx(m, crop, full, 0, 3, idx0);
        build_idx(m, crop, full, 1, 3, idx1);
        build_idx(m, crop, full, 2, 3, idx2);
        last_b = b;
      }
      const float* s = stacks[c] + sim_idx[b] * full3;
      float* o = out + b * sample_out + (int64_t)c * chan_stride;
      const float alpha = normalize ? alphas[c] : 0.f;
      const float mean = normalize ? means[c] : 0.f;
      const float inv_std = normalize ? 1.0f / stds[c] : 1.f;
      for (int64_t i = 0; i < crop; ++i) {
        const int64_t si = idx0[i];
        for (int64_t j = 0; j < crop; ++j) {
          const int64_t sj = si + idx1[j];
          float* orow = o + (i * crop2 + j * crop) * es;
          const int64_t* kk = idx2.data();
          if (normalize) {
            for (int64_t k = 0; k < crop; ++k)
              orow[k * es] = (log10f(s[sj + kk[k]] + alpha) - mean) * inv_std;
          } else {
            for (int64_t k = 0; k < crop; ++k) orow[k * es] = s[sj + kk[k]];
          }
        }
      }
    }
  };
  std::vector<std::thread> pool;
  for (int t = 1; t < nthreads; ++t) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();
}

// 2D batched gather: stacks -> (nsims, full, full); out (batch, crop^2, nchan)
// or (batch, nchan, crop^2). anchors/flips/perms are (batch, 2).
void fastloader_crop2d_batch(const float* const* stacks, int nchan,
                             int64_t full, const int64_t* sim_idx,
                             const int64_t* anchors, const int32_t* flips,
                             const int32_t* perms, float* out, int64_t batch,
                             int64_t crop, const float* alphas,
                             const float* means, const float* stds,
                             int normalize, int channels_last, int nthreads) {
  if (nthreads <= 0) nthreads = (int)std::thread::hardware_concurrency();
  if (nthreads > batch * nchan) nthreads = (int)(batch * nchan);
  if (nthreads < 1) nthreads = 1;
  const int64_t full2 = full * full;
  const int64_t crop2 = crop * crop;
  const int64_t sample_out = (int64_t)nchan * crop2;
  const int64_t chan_stride = channels_last ? 1 : crop2;
  const int64_t es = channels_last ? nchan : 1;

  std::atomic<int64_t> next(0);
  const int64_t n_tasks = batch * nchan;
  auto worker = [&]() {
    std::vector<int64_t> idx0, idx1;
    int64_t last_b = -1;
    AxisMap m{};
    for (;;) {
      int64_t task = next.fetch_add(1);
      if (task >= n_tasks) return;
      const int64_t b = task / nchan;
      const int c = (int)(task % nchan);
      if (b != last_b) {
        m = make_axis_map(anchors ? anchors + 2 * b : nullptr,
                          flips ? flips + 2 * b : nullptr,
                          perms ? perms + 2 * b : nullptr, 2);
        build_idx(m, crop, full, 0, 2, idx0);
        build_idx(m, crop, full, 1, 2, idx1);
        last_b = b;
      }
      const float* s = stacks[c] + sim_idx[b] * full2;
      float* o = out + b * sample_out + (int64_t)c * chan_stride;
      const float alpha = normalize ? alphas[c] : 0.f;
      const float mean = normalize ? means[c] : 0.f;
      const float inv_std = normalize ? 1.0f / stds[c] : 1.f;
      for (int64_t i = 0; i < crop; ++i) {
        const int64_t si = idx0[i];
        float* orow = o + i * crop * es;
        for (int64_t j = 0; j < crop; ++j) {
          float v = s[si + idx1[j]];
          orow[j * es] = normalize ? (log10f(v + alpha) - mean) * inv_std : v;
        }
      }
    }
  };
  std::vector<std::thread> pool;
  for (int t = 1; t < nthreads; ++t) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();
}

// Direct-IO cold read (ROADMAP "native loader: direct-IO path for cold
// reads"): bulk-load a byte range of a file into `out`, bypassing the page
// cache via O_DIRECT where the filesystem supports it. mmap'd stacks fault
// 4K pages synchronously on first touch — a cold epoch over a multi-GB grid
// stack pays random-read latency per page; this path instead streams large
// aligned preads (8 MB chunks, nthreads ranges in parallel) and memcpys the
// requested window, which saturates NVMe/network-FS bandwidth. Falls back to
// buffered pread when O_DIRECT open fails (tmpfs/overlayfs), so callers can
// use it unconditionally.
//
// Returns 0 on success, -1 open failure, -2 short read / IO error,
// -3 allocation failure.
extern "C" int fastloader_read_direct(const char* path, int64_t byte_offset,
                                      int64_t nbytes, void* out,
                                      int nthreads) {
  if (nbytes <= 0) return 0;
  const int64_t kAlign = 4096;
  const int64_t kChunk = 8 << 20;  // 8 MB per pread
  bool direct = true;
  int probe = open(path, O_RDONLY | O_DIRECT);
  if (probe < 0) {
    direct = false;
    probe = open(path, O_RDONLY);
    if (probe < 0) return -1;
  }
  close(probe);

  if (nthreads <= 0) nthreads = (int)std::thread::hardware_concurrency();
  const int64_t n_chunks = (nbytes + kChunk - 1) / kChunk;
  if (nthreads > n_chunks) nthreads = (int)n_chunks;
  if (nthreads < 1) nthreads = 1;

  std::atomic<int64_t> next(0);
  std::atomic<int> err(0);
  auto worker = [&]() {
    int fd = open(path, direct ? (O_RDONLY | O_DIRECT) : O_RDONLY);
    if (fd < 0) {
      err.store(-1);
      return;
    }
    void* buf = nullptr;
    if (posix_memalign(&buf, kAlign, kChunk + 2 * kAlign) != 0) {
      close(fd);
      err.store(-3);  // distinct from -2: ENOMEM, not an IO error
      return;
    }
    for (;;) {
      const int64_t c = next.fetch_add(1);
      if (c >= n_chunks || err.load() != 0) break;
      const int64_t dst_off = c * kChunk;
      const int64_t want = std::min(kChunk, nbytes - dst_off);
      // O_DIRECT needs file offset + length aligned: align the read window
      // down/up and copy out the interior.
      const int64_t file_off = byte_offset + dst_off;
      const int64_t aligned_off = direct ? (file_off & ~(kAlign - 1)) : file_off;
      const int64_t lead = file_off - aligned_off;
      int64_t need = lead + want;
      if (direct) need = (need + kAlign - 1) & ~(kAlign - 1);
      int64_t got = 0;
      while (got < need) {
        ssize_t r = pread(fd, (char*)buf + got, (size_t)(need - got),
                          aligned_off + got);
        if (r < 0) {
          err.store(-2);
          break;
        }
        if (r == 0) break;  // EOF: O_DIRECT tail may legally stop at file end
        got += r;
        // A non-EOF short read can land mid-block; continuing from an
        // unaligned buf/offset under O_DIRECT fails with EINVAL. Round the
        // resume point down to the block boundary and re-read the partial
        // block instead.
        if (direct && got < need && (got & (kAlign - 1)) != 0)
          got &= ~(kAlign - 1);
      }
      if (got < lead + want) {
        if (err.load() == 0) err.store(-2);
        break;
      }
      std::memcpy((char*)out + dst_off, (char*)buf + lead, (size_t)want);
    }
    free(buf);
    close(fd);
  };
  std::vector<std::thread> pool;
  for (int t = 1; t < nthreads; ++t) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();
  return err.load();
}

}  // extern "C"
