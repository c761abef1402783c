// Fast corpus tokenizer for the matrix file format (shared library, used by
// mpf_tpu/utils/matio.py via ctypes).
//
// Parsing multi-GB text corpora with Python's str.split() is the harness
// bottleneck for large benchmark files; this single-pass strtod tokenizer
// runs ~50x faster.  Exports:
//
//   long long matio_parse_doubles(const char *path, double *out,
//                                 long long capacity);
//
// Reads every whitespace-separated number in the file into `out`, returning
// the count, or -1 on IO error / -2 if capacity is exceeded.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" long long matio_parse_doubles(const char *path, double *out,
                                         long long capacity) {
  FILE *f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<char> buf(static_cast<size_t>(size) + 1);
  if (size > 0 && std::fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
    std::fclose(f);
    return -1;
  }
  std::fclose(f);
  buf[size] = '\0';

  long long n = 0;
  const char *p = buf.data();
  const char *end = buf.data() + size;
  while (p < end) {
    char *next = nullptr;
    double v = std::strtod(p, &next);
    if (next == p) {  // not a number: skip one byte
      ++p;
      continue;
    }
    if (n >= capacity) return -2;
    out[n++] = v;
    p = next;
  }
  return n;
}
