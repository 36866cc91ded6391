// latpack — native packed-latents store + multithreaded batch gather.
//
// The reference feeds ImageNet VAE latents from 1.2M+ individual .npy files
// through torch DataLoader worker processes
// (reference: src/tinyedm/datamodules/imagenet_latents_datamodule.py).
// That design is filesystem-bound: millions of tiny random reads per epoch.
// This component packs the dataset once into a single contiguous file and
// serves shuffled batches by mmap'd multithreaded gather — sequential
// packing IO + page-cache-friendly random access, no worker processes.
//
// C ABI (used from Python via ctypes — no pybind11 in this environment):
//   latpack_pack(latents_dir, labels_dir, out_path)      -> n or -errno
//   latpack_open(path)                                    -> handle or null
//   latpack_info(handle, &n, &h, &w, &c)
//   latpack_gather(handle, indices, count, out, labels)   -> 0 or -errno
//   latpack_gather_async(handle, indices, count, out, labels, threads)
//                                                          -> request or null
//   latpack_wait(request)                                  -> gather rc
//   latpack_close(handle)
//
// The async pair double-buffers input: submit the gather for batch k+1
// while the trainer consumes batch k. The copy runs on NATIVE threads with
// no Python involvement, so it sidesteps the GIL/dispatch contention that
// made Python-thread input prefetch a measured negative (BENCH.md round 3);
// the caller's index buffer is copied at submit time, the output buffers
// must stay alive until latpack_wait returns.
//
// File layout (little-endian):
//   magic "LATPACK1" | u32 n | u32 h | u32 w | u32 c |
//   i32 labels[n] | f32 data[n*h*w*c]

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <filesystem>
#include <fstream>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace fs = std::filesystem;

namespace {

constexpr char kMagic[8] = {'L', 'A', 'T', 'P', 'A', 'C', 'K', '1'};

struct Header {
  char magic[8];
  uint32_t n, h, w, c;
};

// Minimal .npy parser: v1/v2 header, little-endian f32/i64/i32, C order.
struct NpyInfo {
  std::vector<size_t> shape;
  char dtype;       // 'f' (f32) or 'i' (i32/i64)
  int itemsize;
  size_t data_offset;
};

bool parse_npy_header(std::ifstream& f, NpyInfo* info) {
  char magic[6];
  f.read(magic, 6);
  if (std::memcmp(magic, "\x93NUMPY", 6) != 0) return false;
  uint8_t major, minor;
  f.read(reinterpret_cast<char*>(&major), 1);
  f.read(reinterpret_cast<char*>(&minor), 1);
  uint32_t header_len = 0;
  if (major == 1) {
    uint16_t len16;
    f.read(reinterpret_cast<char*>(&len16), 2);
    header_len = len16;
    info->data_offset = 10 + header_len;
  } else {
    f.read(reinterpret_cast<char*>(&header_len), 4);
    info->data_offset = 12 + header_len;
  }
  std::string header(header_len, '\0');
  f.read(header.data(), header_len);

  auto find_str = [&](const std::string& key) -> std::string {
    auto pos = header.find(key);
    if (pos == std::string::npos) return "";
    pos = header.find(':', pos);
    auto q1 = header.find('\'', pos);
    auto q2 = header.find('\'', q1 + 1);
    return header.substr(q1 + 1, q2 - q1 - 1);
  };
  std::string descr = find_str("'descr'");
  if (descr == "<f4") {
    info->dtype = 'f';
    info->itemsize = 4;
  } else if (descr == "<i8") {
    info->dtype = 'i';
    info->itemsize = 8;
  } else if (descr == "<i4") {
    info->dtype = 'i';
    info->itemsize = 4;
  } else {
    return false;
  }
  auto pos = header.find("'shape'");
  pos = header.find('(', pos);
  auto end = header.find(')', pos);
  std::string shape_str = header.substr(pos + 1, end - pos - 1);
  info->shape.clear();
  size_t start = 0;
  while (start < shape_str.size()) {
    auto comma = shape_str.find(',', start);
    std::string tok = shape_str.substr(
        start, comma == std::string::npos ? std::string::npos : comma - start);
    // trim
    tok.erase(0, tok.find_first_not_of(" \t"));
    tok.erase(tok.find_last_not_of(" \t") + 1);
    if (!tok.empty()) info->shape.push_back(std::stoull(tok));
    if (comma == std::string::npos) break;
    start = comma + 1;
  }
  return true;
}

struct Handle {
  int fd = -1;
  size_t file_size = 0;
  const uint8_t* base = nullptr;
  Header hdr{};
  const int32_t* labels = nullptr;
  const float* data = nullptr;
  size_t sample_elems = 0;
};

}  // namespace

extern "C" {

// Pack {idx}.npy latent/label pairs into one file. Latents may be stored
// CHW (c in {3,4} leading) — transposed to HWC at pack time so reads are
// layout-free. Returns sample count or -1 on error.
long latpack_pack(const char* latents_dir, const char* labels_dir,
                  const char* out_path) {
  std::vector<fs::path> files;
  for (auto& e : fs::directory_iterator(latents_dir)) {
    if (e.path().extension() == ".npy") files.push_back(e.path());
  }
  if (files.empty()) return -1;
  std::sort(files.begin(), files.end(), [](const fs::path& a, const fs::path& b) {
    return std::stoll(a.stem().string()) < std::stoll(b.stem().string());
  });

  // probe first file for dims
  NpyInfo first;
  {
    std::ifstream f(files[0], std::ios::binary);
    if (!parse_npy_header(f, &first) || first.dtype != 'f') return -2;
  }
  bool chw = false;
  uint32_t h, w, c;
  if (first.shape.size() == 3 && (first.shape[0] == 3 || first.shape[0] == 4) &&
      first.shape[1] == first.shape[2]) {
    chw = true;
    c = first.shape[0];
    h = first.shape[1];
    w = first.shape[2];
  } else if (first.shape.size() == 3) {
    h = first.shape[0];
    w = first.shape[1];
    c = first.shape[2];
  } else {
    return -3;
  }
  const uint32_t n = files.size();
  const size_t elems = static_cast<size_t>(h) * w * c;

  std::ofstream out(out_path, std::ios::binary | std::ios::trunc);
  if (!out) return -4;
  Header hdr;
  std::memcpy(hdr.magic, kMagic, 8);
  hdr.n = n;
  hdr.h = h;
  hdr.w = w;
  hdr.c = c;
  out.write(reinterpret_cast<const char*>(&hdr), sizeof(hdr));

  // labels
  std::vector<int32_t> labels(n);
  for (uint32_t i = 0; i < n; ++i) {
    fs::path lp = fs::path(labels_dir) / files[i].filename();
    std::ifstream lf(lp, std::ios::binary);
    NpyInfo li;
    if (!lf || !parse_npy_header(lf, &li) || li.dtype != 'i') return -5;
    lf.seekg(li.data_offset);
    if (li.itemsize == 8) {
      int64_t v;
      lf.read(reinterpret_cast<char*>(&v), 8);
      labels[i] = static_cast<int32_t>(v);
    } else {
      int32_t v;
      lf.read(reinterpret_cast<char*>(&v), 4);
      labels[i] = v;
    }
  }
  out.write(reinterpret_cast<const char*>(labels.data()), n * sizeof(int32_t));

  // data
  std::vector<float> buf(elems), hwc(elems);
  for (uint32_t i = 0; i < n; ++i) {
    std::ifstream f(files[i], std::ios::binary);
    NpyInfo ni;
    if (!f || !parse_npy_header(f, &ni) || ni.dtype != 'f') return -6;
    f.seekg(ni.data_offset);
    f.read(reinterpret_cast<char*>(buf.data()), elems * sizeof(float));
    const float* src = buf.data();
    if (chw) {
      for (uint32_t ch = 0; ch < c; ++ch)
        for (uint32_t y = 0; y < h; ++y)
          for (uint32_t x = 0; x < w; ++x)
            hwc[(static_cast<size_t>(y) * w + x) * c + ch] =
                buf[(static_cast<size_t>(ch) * h + y) * w + x];
      src = hwc.data();
    }
    out.write(reinterpret_cast<const char*>(src), elems * sizeof(float));
  }
  return static_cast<long>(n);
}

void* latpack_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  void* base = ::mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* h = new Handle;
  h->fd = fd;
  h->file_size = st.st_size;
  h->base = static_cast<const uint8_t*>(base);
  std::memcpy(&h->hdr, h->base, sizeof(Header));
  if (std::memcmp(h->hdr.magic, kMagic, 8) != 0) {
    munmap(base, st.st_size);
    ::close(fd);
    delete h;
    return nullptr;
  }
  h->labels = reinterpret_cast<const int32_t*>(h->base + sizeof(Header));
  h->data = reinterpret_cast<const float*>(h->base + sizeof(Header) +
                                           static_cast<size_t>(h->hdr.n) * 4);
  h->sample_elems =
      static_cast<size_t>(h->hdr.h) * h->hdr.w * h->hdr.c;
  return h;
}

void latpack_info(void* handle, uint32_t* n, uint32_t* h, uint32_t* w,
                  uint32_t* c) {
  auto* hd = static_cast<Handle*>(handle);
  *n = hd->hdr.n;
  *h = hd->hdr.h;
  *w = hd->hdr.w;
  *c = hd->hdr.c;
}

// Gather `count` samples by index into out (count*h*w*c floats) and
// labels_out (count int32), using up to `threads` worker threads.
int latpack_gather(void* handle, const int64_t* indices, int count, float* out,
                   int32_t* labels_out, int threads) {
  auto* hd = static_cast<Handle*>(handle);
  if (threads < 1) threads = 1;
  const size_t elems = hd->sample_elems;
  for (int i = 0; i < count; ++i) {
    if (indices[i] < 0 || indices[i] >= hd->hdr.n) return -1;
    labels_out[i] = hd->labels[indices[i]];
  }
  auto worker = [&](int t) {
    for (int i = t; i < count; i += threads) {
      std::memcpy(out + static_cast<size_t>(i) * elems,
                  hd->data + static_cast<size_t>(indices[i]) * elems,
                  elems * sizeof(float));
    }
  };
  if (threads == 1) {
    worker(0);
  } else {
    std::vector<std::thread> ts;
    ts.reserve(threads);
    for (int t = 0; t < threads; ++t) ts.emplace_back(worker, t);
    for (auto& t : ts) t.join();
  }
  return 0;
}

namespace {
struct AsyncReq {
  std::thread t;
  int rc = 0;
};
}  // namespace

// Submit a gather to run on background native threads. Copies `indices`
// immediately (the caller may reuse that buffer); `out`/`labels_out` are
// written until latpack_wait(request) returns. One dispatcher thread fans
// out to `threads` copy workers, same as the sync path.
void* latpack_gather_async(void* handle, const int64_t* indices, int count,
                           float* out, int32_t* labels_out, int threads) {
  if (count < 0) return nullptr;
  auto* req = new AsyncReq;
  std::vector<int64_t> idx(indices, indices + count);
  req->t = std::thread(
      [handle, count, out, labels_out, threads, req, idx = std::move(idx)]() {
        req->rc = latpack_gather(handle, idx.data(), count, out, labels_out,
                                 threads);
      });
  return req;
}

// Block until an async gather lands; returns its rc and frees the request.
int latpack_wait(void* request) {
  auto* req = static_cast<AsyncReq*>(request);
  req->t.join();
  int rc = req->rc;
  delete req;
  return rc;
}

void latpack_close(void* handle) {
  auto* hd = static_cast<Handle*>(handle);
  if (hd->base) munmap(const_cast<uint8_t*>(hd->base), hd->file_size);
  if (hd->fd >= 0) ::close(hd->fd);
  delete hd;
}

}  // extern "C"
