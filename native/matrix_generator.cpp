// Native matrix corpus generator.
//
// Command-line compatible with the reference generator
// (matrix_generator.cpp in Keyteer/Mixed-precision_LU_Factorization):
//
//   matrix_generator <file> <maxSize> [step=2] [exp|lin] [sparsity]
//
// Emits the same text format (16-char count field back-patched at offset 0,
// then per matrix: n followed by n*n values row by row) and draws values
// from unseeded libc rand() with the same consumption order:
//   - sparsity > 0: one rand() for the Bernoulli draw; a kept element draws
//     a second rand() for its value
//   - value distribution: rand() % 100 / 10.0  (multiples of 0.1 in [0,9.9])
// so corpora are bit-identical with the Python generator
// (mpf_tpu/cli/matrix_generator.py), which clones glibc rand().
//
// This is a fresh implementation written for this repo; it shares only the
// documented CLI/format contract with the reference tool.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Options {
  std::string path;
  long max_size = 0;
  long step = 2;
  bool exponential = true;
  double sparsity = 0.0;
};

int usage(const char *prog) {
  std::fprintf(stderr,
               "Usage: %s filename maxSize [step=2] [function=exp (exp/lin)] "
               "[sparsity=0.0]\n"
               "  sparsity: fraction of zeros in the matrix (0.0 = dense, 0.9 "
               "= 90%% zeros)\n",
               prog);
  return -1;
}

bool parse(int argc, char **argv, Options *o) {
  if (argc < 3) return false;
  o->path = argv[1];
  o->max_size = std::strtol(argv[2], nullptr, 10);
  if (o->max_size <= 0) {
    std::fprintf(stderr, "Invalid maxSize: %s\n", argv[2]);
    return false;
  }
  if (argc > 3) {
    o->step = std::strtol(argv[3], nullptr, 10);
    if (o->step <= 0) {
      std::fprintf(stderr, "Invalid step: %s\n", argv[3]);
      return false;
    }
  }
  if (argc > 4) {
    if (std::strcmp(argv[4], "lin") == 0) {
      o->exponential = false;
    } else if (std::strcmp(argv[4], "exp") != 0) {
      std::fprintf(stderr, "Invalid function: %s. Use 'exp' or 'lin'.\n",
                   argv[4]);
      return false;
    }
  }
  if (o->exponential && o->step < 2) {
    // size *= 1 never grows — the reference would hang here
    std::fprintf(stderr, "Invalid step for exp: %ld. Must be >= 2.\n", o->step);
    return false;
  }
  if (argc > 5) {
    o->sparsity = std::strtod(argv[5], nullptr);
    if (o->sparsity < 0.0 || o->sparsity >= 1.0) {
      std::fprintf(stderr, "Invalid sparsity: %s. Must be in [0.0, 1.0).\n",
                   argv[5]);
      return false;
    }
  }
  return true;
}

// %g formatting of k/10 for k in [0, 100) — matches C++ ostream defaults.
void write_value(FILE *f, int tenths) {
  if (tenths % 10 == 0) {
    std::fprintf(f, "%d ", tenths / 10);
  } else {
    std::fprintf(f, "%d.%d ", tenths / 10, tenths % 10);
  }
}

}  // namespace

int main(int argc, char **argv) {
  Options opt;
  if (!parse(argc, argv, &opt)) return usage(argv[0]);

  FILE *f = std::fopen(opt.path.c_str(), "w");
  if (!f) {
    std::fprintf(stderr, "Failed to open %s\n", opt.path.c_str());
    return -1;
  }
  std::fputs("                \n", f);  // 16-char count field, patched below

  long count = 0;
  for (long n = 2; n <= opt.max_size;
       n = opt.exponential ? n * opt.step : n + opt.step) {
    std::fprintf(f, "%ld\n", n);
    for (long i = 0; i < n; ++i) {
      for (long j = 0; j < n; ++j) {
        if (opt.sparsity > 0.0 &&
            static_cast<double>(rand()) / (RAND_MAX + 1.0) < opt.sparsity) {
          std::fputs("0 ", f);
        } else {
          write_value(f, rand() % 100);
        }
      }
      std::fputc('\n', f);
    }
    std::fputc('\n', f);
    ++count;
    std::fprintf(stderr, "Generating matrix of size %ld\r", n);
  }
  std::fseek(f, 0, SEEK_SET);
  std::fprintf(f, "%ld", count);
  std::fclose(f);
  std::fprintf(stderr, "\nnumber of matrices: %ld\n", count);
  return 0;
}
