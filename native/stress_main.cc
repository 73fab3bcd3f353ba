// Standalone concurrency stress harness for the native batch loader.
//
// Built (by tests/test_native_tsan.py, or by hand) together with loader.cc
// under -fsanitize=thread, so the whole process is TSAN-instrumented — the
// production path loads the library via ctypes into an uninstrumented
// Python, where TSAN cannot run. The reference has no native code at all
// (SURVEY.md §0); this guards the loader's thread pool (shared atomic
// cursor, disjoint output slots) at thread counts far beyond this host's
// single core, where a data race would otherwise first surface in
// production (VERDICT.md round-1 weak #6).
//
// Usage: stress <pathlist.txt> <out_size> <rounds>
//   pathlist.txt: one JPEG path per line.
// Exits 0 iff every round's 32-thread output is byte-identical to the
// single-threaded reference and all images decode. TSAN failures abort the
// process with its own exit code.

#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" int decode_resize_batch(const char** paths, int n,
                                   unsigned char* out, unsigned char* status,
                                   int out_h, int out_w, int num_threads);

int main(int argc, char** argv) {
  if (argc != 4) {
    std::fprintf(stderr, "usage: %s <pathlist.txt> <out_size> <rounds>\n", argv[0]);
    return 2;
  }
  std::vector<std::string> paths;
  {
    std::FILE* fp = std::fopen(argv[1], "r");
    if (!fp) {
      std::perror("pathlist");
      return 2;
    }
    char line[4096];
    while (std::fgets(line, sizeof line, fp)) {
      size_t len = std::strcspn(line, "\r\n");
      if (len > 0) paths.emplace_back(line, len);
    }
    std::fclose(fp);
  }
  const int n = static_cast<int>(paths.size());
  const int size = std::atoi(argv[2]);
  const int rounds = std::atoi(argv[3]);
  if (n == 0 || size <= 0 || rounds <= 0) {
    std::fprintf(stderr, "bad inputs: n=%d size=%d rounds=%d\n", n, size, rounds);
    return 2;
  }
  std::vector<const char*> cpaths(n);
  for (int i = 0; i < n; ++i) cpaths[i] = paths[i].c_str();

  const size_t bytes = static_cast<size_t>(n) * size * size * 3;
  std::vector<unsigned char> ref(bytes), out(bytes);
  std::vector<unsigned char> status(n);

  int ok = decode_resize_batch(cpaths.data(), n, ref.data(), status.data(),
                               size, size, /*num_threads=*/1);
  if (ok != n) {
    std::fprintf(stderr, "single-thread decode failed: %d/%d ok\n", ok, n);
    return 3;
  }
  for (int r = 0; r < rounds; ++r) {
    std::memset(out.data(), 0xAA, bytes);
    std::memset(status.data(), 0xAA, n);
    ok = decode_resize_batch(cpaths.data(), n, out.data(), status.data(),
                             size, size, /*num_threads=*/32);
    if (ok != n) {
      std::fprintf(stderr, "round %d: %d/%d ok\n", r, ok, n);
      return 3;
    }
    for (int i = 0; i < n; ++i) {
      if (status[i] != 1) {
        std::fprintf(stderr, "round %d: status[%d]=%d\n", r, i, status[i]);
        return 3;
      }
    }
    if (std::memcmp(ref.data(), out.data(), bytes) != 0) {
      std::fprintf(stderr, "round %d: 32-thread output differs from 1-thread\n", r);
      return 4;
    }
  }
  std::printf("stress OK: %d images x %d rounds, 32 threads, deterministic\n",
              n, rounds);
  return 0;
}
