// ThreadSanitizer stress harness for the rfsim IQ hub (SURVEY.md §5
// sanitizers/race-detection role; the reference builds with
// --sanitize-address/-memory, cmake_targets/build_oai:160).
//
// Links rfsim.cpp directly and, under -fsanitize=thread, drives the
// hub's full concurrent surface: a listener endpoint with its reader
// thread, N connecting clients on their own threads, interleaved
// rfsim_write / rfsim_read at overlapping timestamps, a concurrent
// rfsim_set_channel reconfiguration mid-traffic, and teardown while
// readers are live.  Any data race in the hub's buffer ring, channel
// state, or endpoint lifetime shows up as a TSan report (exit != 0).
//
// Build + run:  make -C native/rfsim racecheck
#include <atomic>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {
void* rfsim_listen(uint16_t port, uint32_t n_ant);
void* rfsim_connect(const char* host, uint16_t port, uint32_t n_ant,
                    uint32_t timeout_ms);
int rfsim_write(void* handle, int64_t timestamp, const float* iq,
                uint32_t n_samples);
int rfsim_read(void* handle, int64_t timestamp, float* iq,
               uint32_t n_samples);
int rfsim_set_channel(void* handle, const float* taps, uint32_t n_taps,
                      float noise_sigma);
void rfsim_close(void* handle);
}

static constexpr uint16_t PORT = 47901;
static constexpr uint32_t N = 1024;        // samples per slot
static constexpr int SLOTS = 64;

int main() {
  std::atomic<int> fail{0};

  // rfsim_listen blocks in accept(): the client thread must already be
  // connecting (exactly the two-process launch order of ra_ota)
  std::thread client([&] {
    void* cli = rfsim_connect("127.0.0.1", PORT, 1, 5000);
    if (!cli) { fail.fetch_add(1); return; }
    float taps[4] = {1.f, 0.f, 0.1f, 0.05f};
    rfsim_set_channel(cli, taps, 2, 0.01f);
    std::vector<float> tx(2 * N), rx(2 * N);
    // concurrent channel reconfiguration mid-traffic
    std::thread reconf([&] {
      for (int i = 0; i < SLOTS / 4; i++) {
        taps[2] = 0.1f + 0.001f * i;
        rfsim_set_channel(cli, taps, 2, 0.01f + 0.0001f * i);
      }
    });
    for (int s = 0; s < SLOTS; s++) {
      for (uint32_t k = 0; k < N; k++) {
        tx[2 * k] = float(s + 1);
        tx[2 * k + 1] = float(k & 7);
      }
      // odd slots are the client's TX, even slots it reads the server's
      if (rfsim_write(cli, int64_t(2 * s + 1) * N, tx.data(), N)) fail++;
      if (rfsim_read(cli, int64_t(2 * s) * N, rx.data(), N)) fail++;
    }
    reconf.join();
    rfsim_close(cli);
  });

  void* srv = rfsim_listen(PORT, 1);
  if (!srv) { std::fprintf(stderr, "listen failed\n"); client.join(); return 2; }

  std::thread server([&] {
    std::vector<float> tx(2 * N), rx(2 * N);
    for (int s = 0; s < SLOTS; s++) {
      for (uint32_t k = 0; k < N; k++) {
        tx[2 * k] = float(-s - 1);
        tx[2 * k + 1] = 0.5f;
      }
      if (rfsim_write(srv, int64_t(2 * s) * N, tx.data(), N)) fail++;
      if (rfsim_read(srv, int64_t(2 * s + 1) * N, rx.data(), N)) fail++;
    }
  });

  client.join();
  server.join();
  rfsim_close(srv);
  if (fail.load()) { std::fprintf(stderr, "io failures: %d\n", fail.load()); return 1; }
  std::printf("rfsim tsan stress: OK (%d slots both directions)\n", SLOTS);
  return 0;
}
