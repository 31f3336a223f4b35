// Native graph-build benchmark: times compose / determinize / the fused
// LG and TLG paths on packed FSTs dumped from Python (pack_fst layout).
//
//   g++ -O2 -std=c++17 csrc/bench_fstlib.cpp -o bench_fstlib
//   ./bench_fstlib LG   /tmp/lm_L.bin /tmp/lm_G.bin   # op 8 (fused LG)
//   ./bench_fstlib TLG  /tmp/lm_T.bin /tmp/lm_LG.bin  # compiled TLG
//   ./bench_fstlib compose a.bin b.bin                # raw compose only
//
// Includes fstlib.cpp so the anonymous-namespace internals are timeable
// in isolation (same pattern as fstlib_test.cpp).

#include <chrono>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>

#include "fstlib.cpp"

namespace {

std::string slurp(const char* path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) { std::fprintf(stderr, "cannot open %s\n", path); exit(1); }
  return std::string(std::istreambuf_iterator<char>(f), {});
}

double now() {
  return std::chrono::duration<double>(
      std::chrono::steady_clock::now().time_since_epoch()).count();
}

void describe(const char* name, const Fst& f) {
  int64_t arcs = 0;
  for (auto& a : f.arcs) arcs += (int64_t)a.size();
  std::printf("%s: %lld states %lld arcs\n", name,
              (long long)f.num_states(), (long long)arcs);
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 4) { std::fprintf(stderr, "usage: see header\n"); return 2; }
  std::string mode = argv[1];
  std::string b1 = slurp(argv[2]);
  std::string b2 = slurp(argv[3]);
  Fst a = unpack((const uint8_t*)b1.data());
  Fst b = unpack((const uint8_t*)b2.data());
  describe("a", a);
  describe("b", b);

  if (mode == "compose") {
    double t0 = now();
    Fst c = compose(a, b);
    std::printf("compose: %.1fs\n", now() - t0);
    describe("c", c);
  } else if (mode == "LG") {
    double t0 = now();
    Fst c = compose(a, b);
    double t1 = now();
    std::printf("compose: %.1fs\n", t1 - t0);
    describe("LG-raw", c);
    bool ok = true;
    Fst d = determinize_star(c, true, 50000000, &ok);
    double t2 = now();
    std::printf("determinize_star(log): %.1fs ok=%d\n", t2 - t1, (int)ok);
    describe("det", d);
    Fst m = minimize_encoded(d);
    double t3 = now();
    std::printf("minimize: %.1fs\n", t3 - t2);
    describe("LG", m);
    size_t len = 0;
    uint8_t* buf = pack(m, &len);
    std::ofstream f("/tmp/lm_LG.bin", std::ios::binary);
    f.write((const char*)buf, (std::streamsize)len);
    free(buf);
    std::printf("total: %.1fs (wrote /tmp/lm_LG.bin)\n", now() - t0);
  } else if (mode == "TLG") {
    double t0 = now();
    size_t out_len = 0;
    uint8_t* out = nullptr;
    int rc = fstlib_build_tlg_compiled(
        (const uint8_t*)b1.data(), (const uint8_t*)b2.data(), 8, 0, 1,
        &out, &out_len);
    std::printf("build_tlg_compiled rc=%d: %.1fs (%.0f MB)\n", rc,
                now() - t0, out_len / 1e6);
    if (rc == 0) fstlib_free(out);
  } else {
    std::fprintf(stderr, "unknown mode %s\n", mode.c_str());
    return 2;
  }
  return 0;
}
