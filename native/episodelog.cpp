// episodelog: native chunked episode store for play-data collection/replay.
//
// Role: the reference exists to generate and replay teleoperated "play"
// episodes (reference README.md:2-10 — vr_data_collection.py writes them,
// learning_from_play replays them). This is the TPU framework's native
// runtime half of that pipeline: a C++ append-only binary log of
// fixed-schema float32 episode streams with an O(1) random-access index,
// consumed from Python via ctypes (utils/episodelog.py) with zero-copy
// numpy reads.
//
// File layout (little-endian):
//   header : magic "EPLG" | u32 version | u32 n_fields | u32 dims[n_fields]
//   body   : per episode: u32 n_steps | f32 data[field0 n_steps*dim0] |
//            f32 data[field1 ...] | ...
//   footer : u64 offsets[n_episodes] | u64 n_episodes | magic "EIDX"
//
// Build: make -C native   (produces libepisodelog.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x474C5045;  // "EPLG"
constexpr uint32_t kIdxMagic = 0x58444945;  // "EIDX"
constexpr uint32_t kVersion = 1;

struct Writer {
  FILE* f = nullptr;
  std::vector<uint32_t> dims;
  std::vector<uint64_t> offsets;
  std::vector<std::vector<float>> pending;  // per-field step buffer
  uint32_t steps = 0;
  bool in_episode = false;
};

struct Reader {
  FILE* f = nullptr;
  std::vector<uint32_t> dims;
  std::vector<uint64_t> offsets;
  std::vector<uint32_t> lengths;
};

}  // namespace

extern "C" {

// ---------------------------------------------------------------- writer --
void* elog_create(const char* path, uint32_t n_fields,
                  const uint32_t* dims) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return nullptr;
  auto* w = new Writer();
  w->f = f;
  w->dims.assign(dims, dims + n_fields);
  w->pending.resize(n_fields);
  std::fwrite(&kMagic, 4, 1, f);
  std::fwrite(&kVersion, 4, 1, f);
  std::fwrite(&n_fields, 4, 1, f);
  std::fwrite(dims, 4, n_fields, f);
  return w;
}

int elog_begin_episode(void* h) {
  auto* w = static_cast<Writer*>(h);
  if (!w || w->in_episode) return -1;
  w->in_episode = true;
  w->steps = 0;
  for (auto& p : w->pending) p.clear();
  return 0;
}

// one step: data is the concatenation of all fields' values (sum of dims)
int elog_append_step(void* h, const float* data) {
  auto* w = static_cast<Writer*>(h);
  if (!w || !w->in_episode) return -1;
  size_t off = 0;
  for (size_t i = 0; i < w->dims.size(); ++i) {
    w->pending[i].insert(w->pending[i].end(), data + off,
                         data + off + w->dims[i]);
    off += w->dims[i];
  }
  w->steps++;
  return 0;
}

// bulk append: per-field pointer, n_steps rows each (row-major steps×dim)
int elog_append_batch(void* h, const float* const* fields,
                      uint32_t n_steps) {
  auto* w = static_cast<Writer*>(h);
  if (!w || !w->in_episode) return -1;
  for (size_t i = 0; i < w->dims.size(); ++i) {
    const float* src = fields[i];
    w->pending[i].insert(w->pending[i].end(), src,
                         src + size_t(n_steps) * w->dims[i]);
  }
  w->steps += n_steps;
  return 0;
}

// Disk-full / I/O errors must not produce a silently-truncated log that
// still carries a plausible footer: every fwrite/ftell is checked and a
// nonzero code propagates to the Python binding, which raises.
int elog_end_episode(void* h) {
  auto* w = static_cast<Writer*>(h);
  if (!w || !w->in_episode) return -1;
  long pos = std::ftell(w->f);
  if (pos < 0) return -2;
  if (std::fwrite(&w->steps, 4, 1, w->f) != 1) return -2;
  for (size_t i = 0; i < w->dims.size(); ++i) {
    size_t n = w->pending[i].size();
    if (std::fwrite(w->pending[i].data(), 4, n, w->f) != n) return -2;
  }
  w->offsets.push_back(static_cast<uint64_t>(pos));
  w->in_episode = false;
  return 0;
}

int elog_close_writer(void* h) {
  auto* w = static_cast<Writer*>(h);
  if (!w) return -1;
  int rc = 0;
  if (w->in_episode && elog_end_episode(h) != 0) rc = -2;
  uint64_t n = w->offsets.size();
  if (rc == 0) {
    if (std::fwrite(w->offsets.data(), 8, n, w->f) != n ||
        std::fwrite(&n, 8, 1, w->f) != 1 ||
        std::fwrite(&kIdxMagic, 4, 1, w->f) != 1) {
      rc = -2;
    }
  }
  if (std::fclose(w->f) != 0) rc = -2;
  delete w;
  return rc;
}

// ---------------------------------------------------------------- reader --
void* elog_open(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  uint32_t magic = 0, version = 0, n_fields = 0;
  if (std::fread(&magic, 4, 1, f) != 1 || magic != kMagic ||
      std::fread(&version, 4, 1, f) != 1 ||
      std::fread(&n_fields, 4, 1, f) != 1) {
    std::fclose(f);
    return nullptr;
  }
  auto* r = new Reader();
  r->f = f;
  r->dims.resize(n_fields);
  if (std::fread(r->dims.data(), 4, n_fields, f) != n_fields) {
    std::fclose(f);
    delete r;
    return nullptr;
  }
  // footer
  std::fseek(f, -12, SEEK_END);
  uint64_t n = 0;
  uint32_t idx_magic = 0;
  if (std::fread(&n, 8, 1, f) != 1 || std::fread(&idx_magic, 4, 1, f) != 1 ||
      idx_magic != kIdxMagic) {
    std::fclose(f);
    delete r;
    return nullptr;
  }
  r->offsets.resize(n);
  std::fseek(f, -12 - static_cast<long>(8 * n), SEEK_END);
  if (std::fread(r->offsets.data(), 8, n, f) != n) {
    std::fclose(f);
    delete r;
    return nullptr;
  }
  r->lengths.resize(n);
  for (uint64_t i = 0; i < n; ++i) {
    std::fseek(f, static_cast<long>(r->offsets[i]), SEEK_SET);
    if (std::fread(&r->lengths[i], 4, 1, f) != 1) r->lengths[i] = 0;
  }
  return r;
}

int64_t elog_num_episodes(void* h) {
  auto* r = static_cast<Reader*>(h);
  return r ? static_cast<int64_t>(r->offsets.size()) : -1;
}

int64_t elog_num_fields(void* h) {
  auto* r = static_cast<Reader*>(h);
  return r ? static_cast<int64_t>(r->dims.size()) : -1;
}

int64_t elog_field_dim(void* h, uint32_t field) {
  auto* r = static_cast<Reader*>(h);
  if (!r || field >= r->dims.size()) return -1;
  return r->dims[field];
}

int64_t elog_episode_len(void* h, uint64_t ep) {
  auto* r = static_cast<Reader*>(h);
  if (!r || ep >= r->lengths.size()) return -1;
  return r->lengths[ep];
}

// read one field of one episode into out (n_steps*dim floats)
int elog_read(void* h, uint64_t ep, uint32_t field, float* out) {
  auto* r = static_cast<Reader*>(h);
  if (!r || ep >= r->offsets.size() || field >= r->dims.size()) return -1;
  uint64_t off = r->offsets[ep] + 4;
  uint32_t steps = r->lengths[ep];
  for (uint32_t i = 0; i < field; ++i) {
    off += static_cast<uint64_t>(steps) * r->dims[i] * 4;
  }
  std::fseek(r->f, static_cast<long>(off), SEEK_SET);
  size_t want = static_cast<size_t>(steps) * r->dims[field];
  return std::fread(out, 4, want, r->f) == want ? 0 : -1;
}

int elog_close_reader(void* h) {
  auto* r = static_cast<Reader*>(h);
  if (!r) return -1;
  std::fclose(r->f);
  delete r;
  return 0;
}

}  // extern "C"
