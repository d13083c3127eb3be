// Native host runtime: WAV codec + serial CPU moving averager + bench CLI.
//
// The reference's native layer is C++/CUDA (wav_header.h, benchmark.h,
// profilable_moving_averager.cpp). The TPU framework keeps the host-native
// pieces native: this file provides
//   - a canonical 44-byte PCM WAV reader/writer (16-bit only, rejecting
//     8/24/32/64-bit like wav_header.h:34-37),
//   - the golden serial sliding-sum averager (ramp-up divides by the full
//     window; int64 accumulators; C truncating division — the semantics of
//     profilable_moving_averager.cpp:14-37, with the missing-brace defect
//     fixed per SURVEY.md §7),
//   - a warmup-then-average wall-clock bench loop (benchmark.h:116-132
//     protocol: 5 warmup + 10 measured rounds),
// exposed through an extern "C" ABI for the Python ctypes wrapper
// (digital_signal_processsing_tpu/io/native.py) and through the standalone
// CLI `dsp_cpu_bench <wav_path> <grade> <block_size>` mirroring the
// reference binaries' argv contract.
//
// Build: make -C native   (produces libdsp_native.so and dsp_cpu_bench)

#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <thread>
#include <vector>

namespace {

#pragma pack(push, 1)
struct WavHeader {
  char riff[4];
  uint32_t size_of_file;
  char wave[4];
  char fmt[4];
  uint32_t fmt_size;
  uint16_t audio_format;
  uint16_t num_channels;
  uint32_t sample_rate;
  uint32_t byte_rate;
  uint16_t block_align;
  uint16_t bits_per_sample;
  char data[4];
  uint32_t data_bytes;
};
#pragma pack(pop)
static_assert(sizeof(WavHeader) == 44, "canonical header must be 44 bytes");

bool header_ok(const WavHeader& h) {
  return std::memcmp(h.riff, "RIFF", 4) == 0 &&
         std::memcmp(h.wave, "WAVE", 4) == 0 &&
         std::memcmp(h.fmt, "fmt ", 4) == 0 &&
         std::memcmp(h.data, "data", 4) == 0 && h.audio_format == 1 &&
         h.bits_per_sample == 16 &&  // reject 8/24/32/64 like wav_header.h:34-37
         h.num_channels >= 1;        // a zero channel count would SIGFPE below
}

int64_t trunc_div(int64_t num, int64_t den) { return num / den; }  // C trunc

}  // namespace

extern "C" {

// Reads header only; returns 0 on success. Outputs channels/rate/samples.
int dsp_wav_info(const char* path, int32_t* channels, int32_t* sample_rate,
                 int64_t* num_samples) {
  std::ifstream in(path, std::ios::binary);
  if (!in) return 1;
  WavHeader h;
  in.read(reinterpret_cast<char*>(&h), sizeof(h));
  if (!in || !header_ok(h)) return 2;
  *channels = h.num_channels;
  *sample_rate = h.sample_rate;
  *num_samples = h.data_bytes / 2;
  return 0;
}

// Reads up to max_samples int16 samples into out. Returns count read, or <0.
int64_t dsp_wav_read(const char* path, int16_t* out, int64_t max_samples) {
  std::ifstream in(path, std::ios::binary);
  if (!in) return -1;
  WavHeader h;
  in.read(reinterpret_cast<char*>(&h), sizeof(h));
  if (!in || !header_ok(h)) return -2;
  int64_t n = h.data_bytes / 2;
  if (n > max_samples) n = max_samples;
  in.read(reinterpret_cast<char*>(out), n * 2);
  return in.gcount() / 2;
}

// Writes a canonical 16-bit PCM WAV. Returns 0 on success.
int dsp_wav_write(const char* path, const int16_t* samples,
                  int64_t num_samples, int32_t sample_rate,
                  int32_t channels) {
  if (channels < 1 || num_samples % channels != 0) return 3;
  std::ofstream out(path, std::ios::binary);
  if (!out) return 1;
  WavHeader h;
  std::memcpy(h.riff, "RIFF", 4);
  std::memcpy(h.wave, "WAVE", 4);
  std::memcpy(h.fmt, "fmt ", 4);
  std::memcpy(h.data, "data", 4);
  h.fmt_size = 16;
  h.audio_format = 1;
  h.num_channels = static_cast<uint16_t>(channels);
  h.sample_rate = static_cast<uint32_t>(sample_rate);
  h.bits_per_sample = 16;
  h.byte_rate = h.sample_rate * channels * 2;
  h.block_align = static_cast<uint16_t>(channels * 2);
  h.data_bytes = static_cast<uint32_t>(num_samples * 2);
  h.size_of_file = 36 + h.data_bytes;
  out.write(reinterpret_cast<const char*>(&h), sizeof(h));
  out.write(reinterpret_cast<const char*>(samples), num_samples * 2);
  return out ? 0 : 2;
}

// Threaded batch reader: decode n files concurrently into one buffer.
// offsets[i] is the destination sample offset of file i (caller computes
// from dsp_wav_info); counts[i] its expected sample count. Returns the
// number of files read successfully.
int dsp_wav_read_many(const char** paths, int32_t n, int16_t* out,
                      const int64_t* offsets, const int64_t* counts,
                      int32_t num_threads) {
  if (n <= 0) return 0;
  if (num_threads < 1) num_threads = 1;
  std::atomic<int32_t> next{0};
  std::atomic<int32_t> ok{0};
  auto worker = [&]() {
    for (;;) {
      int32_t i = next.fetch_add(1);
      if (i >= n) return;
      int64_t got = dsp_wav_read(paths[i], out + offsets[i], counts[i]);
      if (got == counts[i]) ok.fetch_add(1);
    }
  };
  int32_t t = num_threads < n ? num_threads : n;
  std::vector<std::thread> pool;
  pool.reserve(t);
  for (int32_t i = 0; i < t; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return ok.load();
}

// Golden serial moving averager over an interleaved int16 stream.
// Semantics of profilable_moving_averager.cpp:14-37: per-channel int64
// sliding sums, ramp-up divides by the FULL window, truncating division.
void dsp_moving_average(const int16_t* in, int16_t* out, int64_t num_samples,
                        int32_t channels, int32_t window) {
  const int64_t frames = num_samples / channels;
  std::vector<int64_t> sums(channels, 0);
  const int64_t ramp = window < frames ? window : frames;
  for (int64_t f = 0; f < ramp; ++f) {
    for (int32_t c = 0; c < channels; ++c) {
      sums[c] += in[f * channels + c];
      out[f * channels + c] =
          static_cast<int16_t>(trunc_div(sums[c], window));
    }
  }
  for (int64_t f = window; f < frames; ++f) {
    for (int32_t c = 0; c < channels; ++c) {
      sums[c] += in[f * channels + c] - in[(f - window) * channels + c];
      out[f * channels + c] =
          static_cast<int16_t>(trunc_div(sums[c], window));
    }
  }
}

// Warmup-then-average bench of the averager (benchmark.h:116-132 protocol).
// Returns mean milliseconds per measured round.
double dsp_bench_moving_average(const int16_t* in, int16_t* out,
                                int64_t num_samples, int32_t channels,
                                int32_t window, int32_t warmup,
                                int32_t rounds) {
  for (int32_t i = 0; i < warmup; ++i)
    dsp_moving_average(in, out, num_samples, channels, window);
  auto t0 = std::chrono::steady_clock::now();
  for (int32_t i = 0; i < rounds; ++i)
    dsp_moving_average(in, out, num_samples, channels, window);
  auto t1 = std::chrono::steady_clock::now();
  volatile int16_t sink = out[num_samples - 1];  // defeat DCE
  (void)sink;
  return std::chrono::duration<double, std::milli>(t1 - t0).count() /
         (rounds > 0 ? rounds : 1);
}

}  // extern "C"

#ifdef DSP_NATIVE_MAIN
// CLI mirroring the reference binaries: <wav_path> <grade> <block_size>.
// block_size is accepted for argv compatibility (validated like
// profilable_moving_averager.cpp:94-97) but has no meaning on the host path.
int main(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr, "Usage: %s <wav_path> <grade> <block_size>\n",
                 argv[0]);
    return 1;
  }
  const char* path = argv[1];
  const int window = std::atoi(argv[2]);
  const int block = std::atoi(argv[3]);
  if (block < 32 || block > 1024 || block % 32 != 0) {
    std::fprintf(stderr, "Error: Block size must be multiple of 32\n");
    return 1;
  }
  if (window < 1) {
    std::fprintf(stderr, "Error: grade must be >= 1\n");
    return 1;
  }
  int32_t channels = 0, rate = 0;
  int64_t n = 0;
  if (dsp_wav_info(path, &channels, &rate, &n) != 0 || n <= 0) {
    std::fprintf(stderr, "Error: could not read %s\n", path);
    return 1;
  }
  std::vector<int16_t> in(n), out(n);
  if (dsp_wav_read(path, in.data(), n) != n) {
    std::fprintf(stderr, "Error: short read from %s\n", path);
    return 1;
  }
  const double ms =
      dsp_bench_moving_average(in.data(), out.data(), n, channels, window,
                               /*warmup=*/5, /*rounds=*/10);
  std::printf("--- native serial averager ---\n");
  std::printf("total samples: %lld\n", static_cast<long long>(n));
  std::printf("window: %d\n", window);
  std::printf("compute: %.3f ms  (%.3f MSamples/s)\n", ms,
              n / ms / 1e3);
  return 0;
}
#endif
