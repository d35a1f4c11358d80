// tabhost — native host-side data path for the TPU training pipeline.
//
// The reference's input pipeline burns CPU in Python: librosa decode +
// per-segment slicing inside DataLoader worker processes
// (my_dataloader.py, cqt.py:19-49).  When this framework trains from raw
// audio (on-device CQT), the host-side work is WAV decode + sliding-window
// batch assembly; this library does both in C++ with a thread pool so the
// host keeps a TPU-sized batch queue full without the GIL in the loop.
//
// Exposed as a plain C ABI consumed via ctypes
// (guitar_tablature_classification_tpu/data/native_loader.py).
//
// Build: make -C native   (produces libtabhost.so)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------- WAV I/O

struct WavData {
  std::vector<float> samples;  // mono, [-1, 1]
  int sample_rate = 0;
};

bool read_wav(const char* path, WavData* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  auto rd_u32 = [&](uint32_t* v) { return std::fread(v, 4, 1, f) == 1; };
  auto rd_u16 = [&](uint16_t* v) { return std::fread(v, 2, 1, f) == 1; };

  char tag[4];
  uint32_t riff_size = 0;
  if (std::fread(tag, 1, 4, f) != 4 || std::memcmp(tag, "RIFF", 4) != 0 ||
      !rd_u32(&riff_size) || std::fread(tag, 1, 4, f) != 4 ||
      std::memcmp(tag, "WAVE", 4) != 0) {
    std::fclose(f);
    return false;
  }

  uint16_t format = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  bool have_fmt = false;
  std::vector<uint8_t> data;

  while (std::fread(tag, 1, 4, f) == 4) {
    uint32_t size = 0;
    if (!rd_u32(&size)) break;
    if (std::memcmp(tag, "fmt ", 4) == 0) {
      uint32_t byte_rate;
      uint16_t block_align;
      if (!rd_u16(&format) || !rd_u16(&channels) || !rd_u32(&sample_rate) ||
          !rd_u32(&byte_rate) || !rd_u16(&block_align) || !rd_u16(&bits)) {
        break;
      }
      if (size > 16) std::fseek(f, size - 16, SEEK_CUR);
      have_fmt = true;
    } else if (std::memcmp(tag, "data", 4) == 0) {
      data.resize(size);
      if (std::fread(data.data(), 1, size, f) != size) break;
    } else {
      std::fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
  std::fclose(f);
  if (!have_fmt || data.empty() || channels == 0) return false;

  const size_t frames = data.size() / (channels * (bits / 8));
  out->samples.resize(frames);
  out->sample_rate = static_cast<int>(sample_rate);
  const float inv_channels = 1.0f / channels;

  if (format == 1 && bits == 16) {
    auto* p = reinterpret_cast<const int16_t*>(data.data());
    for (size_t i = 0; i < frames; ++i) {
      float acc = 0.f;
      for (int c = 0; c < channels; ++c) acc += p[i * channels + c];
      out->samples[i] = acc * inv_channels / 32768.0f;
    }
  } else if (format == 1 && bits == 32) {
    auto* p = reinterpret_cast<const int32_t*>(data.data());
    for (size_t i = 0; i < frames; ++i) {
      double acc = 0.;
      for (int c = 0; c < channels; ++c) acc += p[i * channels + c];
      out->samples[i] =
          static_cast<float>(acc * inv_channels / 2147483648.0);
    }
  } else if (format == 3 && bits == 32) {  // IEEE float
    auto* p = reinterpret_cast<const float*>(data.data());
    for (size_t i = 0; i < frames; ++i) {
      float acc = 0.f;
      for (int c = 0; c < channels; ++c) acc += p[i * channels + c];
      out->samples[i] = acc * inv_channels;
    }
  } else {
    return false;
  }
  return true;
}

// ------------------------------------------------------------ window loader

struct Window {
  int track;
  int64_t start;  // sample offset
};

struct Loader {
  int window_samples;
  int hop_samples;
  int batch_size;
  uint64_t seed;

  std::vector<WavData> tracks;
  std::vector<Window> windows;  // global window list
  std::vector<uint32_t> order;  // shuffled indices
  std::atomic<size_t> cursor{0};
  int epoch = 0;
  std::string error;
};

uint64_t splitmix64(uint64_t* s) {
  uint64_t z = (*s += 0x9E3779B97F4A7C15ull);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
  return z ^ (z >> 31);
}

void reshuffle(Loader* l) {
  uint64_t s = l->seed + static_cast<uint64_t>(l->epoch) * 0x51ED2701;
  const size_t n = l->order.size();
  for (size_t i = n - 1; i > 0; --i) {
    size_t j = splitmix64(&s) % (i + 1);
    std::swap(l->order[i], l->order[j]);
  }
}

}  // namespace

extern "C" {

// Decode a WAV to mono float32.  Returns sample count (<0 on error);
// call with out=nullptr to query the size first.
int64_t tabhost_wav_read(const char* path, float* out, int64_t capacity,
                         int32_t* sample_rate) {
  WavData wav;
  if (!read_wav(path, &wav)) return -1;
  if (sample_rate) *sample_rate = wav.sample_rate;
  const int64_t n = static_cast<int64_t>(wav.samples.size());
  if (out) {
    if (capacity < n) return -2;
    std::memcpy(out, wav.samples.data(), n * sizeof(float));
  }
  return n;
}

// Extract sliding windows from a track buffer into a [num, window] batch.
// Returns the number of complete windows written (cqt.py:30 semantics).
int64_t tabhost_frame_windows(const float* samples, int64_t n,
                              int32_t window, int32_t hop, float* out,
                              int64_t max_windows) {
  if (n < window) return 0;
  int64_t count = (n - window) / hop + 1;
  if (count > max_windows) count = max_windows;
  for (int64_t i = 0; i < count; ++i) {
    std::memcpy(out + i * window, samples + i * hop,
                window * sizeof(float));
  }
  return count;
}

// -- batched shuffling loader over many tracks ---------------------------

void* tabhost_loader_create(const char** paths, int32_t num_paths,
                            int32_t window_samples, int32_t hop_samples,
                            int32_t batch_size, uint64_t seed,
                            int32_t num_threads) {
  auto* l = new Loader();
  l->window_samples = window_samples;
  l->hop_samples = hop_samples;
  l->batch_size = batch_size;
  l->seed = seed;
  l->tracks.resize(num_paths);

  // parallel decode
  std::atomic<int32_t> next{0};
  std::atomic<bool> ok{true};
  auto worker = [&]() {
    for (;;) {
      int32_t i = next.fetch_add(1);
      if (i >= num_paths) return;
      if (!read_wav(paths[i], &l->tracks[i])) ok = false;
    }
  };
  int32_t nt = num_threads > 0 ? num_threads : 4;
  std::vector<std::thread> threads;
  for (int32_t t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  if (!ok) {
    delete l;
    return nullptr;
  }

  for (int32_t t = 0; t < num_paths; ++t) {
    const int64_t n = static_cast<int64_t>(l->tracks[t].samples.size());
    if (n < window_samples) continue;
    const int64_t count = (n - window_samples) / hop_samples + 1;
    for (int64_t i = 0; i < count; ++i) {
      l->windows.push_back({t, i * hop_samples});
    }
  }
  l->order.resize(l->windows.size());
  for (uint32_t i = 0; i < l->order.size(); ++i) l->order[i] = i;
  reshuffle(l);
  return l;
}

int64_t tabhost_loader_num_windows(void* handle) {
  return static_cast<Loader*>(handle)->windows.size();
}

// Fill one [batch_size, window_samples] batch (shuffled, wrapping across
// epochs with a reshuffle).  Also writes each window's (track, start)
// provenance for label lookup.  Returns rows written.
int32_t tabhost_loader_next(void* handle, float* out, int32_t* track_ids,
                            int64_t* starts) {
  auto* l = static_cast<Loader*>(handle);
  const size_t total = l->order.size();
  if (total == 0) return 0;
  for (int32_t row = 0; row < l->batch_size; ++row) {
    size_t cur = l->cursor.fetch_add(1);
    if (cur >= total) {
      l->cursor = 1;
      cur = 0;
      l->epoch++;
      reshuffle(l);
    }
    const Window& w = l->windows[l->order[cur % total]];
    const float* src = l->tracks[w.track].samples.data() + w.start;
    std::memcpy(out + static_cast<int64_t>(row) * l->window_samples, src,
                l->window_samples * sizeof(float));
    if (track_ids) track_ids[row] = w.track;
    if (starts) starts[row] = w.start;
  }
  return l->batch_size;
}

void tabhost_loader_destroy(void* handle) {
  delete static_cast<Loader*>(handle);
}

}  // extern "C"
