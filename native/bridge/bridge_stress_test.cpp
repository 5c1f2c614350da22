// Sanitizer stress harness for libsrbd_bridge (SURVEY.md §5.2 — the
// race-detection/sanitizer subsystem the reference never needed because it
// had no native code; this runtime ships a lock-free SPSC shared-memory
// ring, so its concurrency contract is machine-checked here).
//
// Build + run under TSan and ASan/UBSan via `make -C native/bridge
// sanitize` (tests/test_bridge.py drives it). Exercises:
//   1. the SPSC ring's release/acquire protocol with a real concurrent
//      producer/consumer pair on ONE mapping (the supported topology:
//      TSan only models happens-before within a single address range),
//      with wraparound (capacity far smaller than total traffic) and
//      content verification of every record;
//   2. the UDP pub/sub framing end-to-end on loopback.
//
// Exits 0 iff every record arrived intact in order; any data race /
// UB / heap error is reported by the sanitizer runtime (non-zero exit).

#include <arpa/inet.h>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <netinet/in.h>
#include <sys/socket.h>
#include <thread>
#include <unistd.h>

extern "C" {
void* router_create(int port, int n_robots);
int router_snapshot(void* h, float* out, uint64_t* counts);
int router_send_results(void* h, const float* rows, int n_vals);
void router_destroy(void* h);
void* ring_create(const char* name, uint64_t capacity, int create);
int ring_push(void* h, const void* data, uint32_t len);
int ring_pop(void* h, void* buf, uint32_t buf_cap);
void ring_destroy(void* h);
void* bridge_pub_create(const char* host, int port);
int bridge_pub_send(void* h, const char* topic, const void* data, int len);
void bridge_pub_destroy(void* h);
void* bridge_sub_create(int port);
int bridge_sub_poll(void* h, char* topic_buf, int topic_cap, void* buf,
                    int buf_cap, int timeout_ms);
void bridge_sub_destroy(void* h);
}

namespace {

constexpr uint32_t kRecords = 200000;
constexpr uint64_t kCapacity = 1 << 12;  // tiny: forces constant wraparound

struct Record {
  uint32_t seq;
  uint32_t check;
};

int run_ring_stress() {
  // PID-derived name: the TSan and ASan binaries (and overlapping CI
  // jobs) must not collide on one shm object.
  char shm_name[64];
  snprintf(shm_name, sizeof(shm_name), "/srbd_bridge_stress.%d",
           (int)getpid());
  void* ring = ring_create(shm_name, kCapacity, 1);
  if (!ring) {
    fprintf(stderr, "ring_create failed\n");
    return 1;
  }
  std::atomic<int> errors{0};
  // Set by the consumer on a corrupted record so the producer's
  // push-retry loop exits instead of spinning forever against a full
  // ring (the consumer is gone; nothing would ever drain it).
  std::atomic<bool> abort_flag{false};

  std::thread consumer([&] {
    Record r{};
    uint32_t expect = 0;
    while (expect < kRecords) {
      int n = ring_pop(ring, &r, sizeof(r));
      if (n == 0) {
        std::this_thread::yield();
        continue;
      }
      if (n != sizeof(r) || r.seq != expect ||
          r.check != (r.seq ^ 0xdeadbeefu)) {
        errors.fetch_add(1, std::memory_order_relaxed);
        abort_flag.store(true, std::memory_order_release);
        break;
      }
      expect++;
    }
  });

  for (uint32_t seq = 0;
       seq < kRecords && !abort_flag.load(std::memory_order_acquire);
       seq++) {
    Record r{seq, seq ^ 0xdeadbeefu};
    while (ring_push(ring, &r, sizeof(r)) != 0) {
      if (abort_flag.load(std::memory_order_acquire)) break;
      std::this_thread::yield();
    }
  }
  consumer.join();
  ring_destroy(ring);
  int n_errors = errors.load(std::memory_order_relaxed);
  if (n_errors)
    fprintf(stderr, "ring: %d corrupted/out-of-order records\n", n_errors);
  return n_errors;
}

int run_udp_roundtrip() {
  // PID-derived port for the same concurrent-runs reason as the shm name.
  const int port = 47000 + (int)(getpid() % 1000);
  void* sub = bridge_sub_create(port);
  void* pub = bridge_pub_create("127.0.0.1", port);
  if (!sub || !pub) {
    fprintf(stderr, "udp setup failed\n");
    return 1;
  }
  const char payload[] = "sanitizer roundtrip";
  int rc = 1;
  // UDP on loopback is reliable in practice but not guaranteed: retry
  for (int attempt = 0; attempt < 5 && rc != 0; attempt++) {
    bridge_pub_send(pub, "stress", payload, sizeof(payload));
    char topic[64];
    char buf[128];
    int n = bridge_sub_poll(sub, topic, sizeof(topic), buf, sizeof(buf), 500);
    if (n == (int)sizeof(payload) && strcmp(topic, "stress") == 0 &&
        memcmp(buf, payload, n) == 0)
      rc = 0;
  }
  bridge_pub_destroy(pub);
  bridge_sub_destroy(sub);
  if (rc) fprintf(stderr, "udp roundtrip failed\n");
  return rc;
}

// Fleet router under concurrency: a sender thread blasts command
// packets round-robin over the robot ids while the main thread
// snapshots continuously (the per-tick pattern) — TSan checks the
// receive-thread/snapshot locking; content checks catch torn slots.
// Packets carry vx = robot_id + 0.5 and wz = 2·robot_id so ANY snapshot
// row must satisfy both invariants regardless of which packet landed
// last (UDP bursts on loopback may drop under load; the invariant is
// loss-tolerant).
int run_router_stress() {
  const int port = 48000 + (int)(getpid() % 1000);
  constexpr int kRobots = 8;
  constexpr int kPackets = 20000;
  void* router = router_create(port, kRobots);
  void* pub_sock = bridge_pub_create("127.0.0.1", port);  // raw sender fd
  if (!router || !pub_sock) {
    fprintf(stderr, "router setup failed\n");
    return 1;
  }
  bridge_pub_destroy(pub_sock);  // we need a raw socket, not the framed pub

  std::atomic<bool> done{false};
  std::thread sender([&] {
    int fd = socket(AF_INET, SOCK_DGRAM, 0);
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_port = htons((uint16_t)port);
    inet_pton(AF_INET, "127.0.0.1", &addr.sin_addr);
    struct {
      uint32_t magic, id;
      int32_t action;
      float vx, vy, wz;
    } pkt{0x464C5254u, 0, 1, 0.f, 0.f, 0.f};
    for (int k = 0; k < kPackets; k++) {
      uint32_t id = (uint32_t)(k % kRobots);
      pkt.id = id;
      pkt.vx = (float)id + 0.5f;
      pkt.vy = -(float)id;
      pkt.wz = 2.0f * (float)id;
      sendto(fd, &pkt, sizeof(pkt), 0, (sockaddr*)&addr, sizeof(addr));
      if (k % 64 == 0) std::this_thread::yield();  // let the ring drain
    }
    close(fd);
    done.store(true, std::memory_order_release);
  });

  float out[4 * kRobots];
  uint64_t counts[kRobots];
  int errors = 0;
  uint64_t total = 0;
  while (!done.load(std::memory_order_acquire) || total == 0) {
    router_snapshot(router, out, counts);
    total = 0;
    for (int i = 0; i < kRobots; i++) {
      total += counts[i];
      if (counts[i] == 0) continue;  // nothing landed yet
      // torn-slot check: every field must belong to the SAME robot
      if (out[4 * i + 1] != (float)i + 0.5f || out[4 * i + 2] != -(float)i ||
          out[4 * i + 3] != 2.0f * (float)i || out[4 * i + 0] != 1.0f) {
        errors++;
      }
    }
  }
  sender.join();
  router_destroy(router);
  if (errors) fprintf(stderr, "router: %d torn snapshots\n", errors);
  if (total == 0) {
    fprintf(stderr, "router: no packets arrived\n");
    return 1;
  }
  return errors;
}

}  // namespace

int main() {
  int rc = run_ring_stress() + run_udp_roundtrip() + run_router_stress();
  if (rc == 0) printf("bridge stress: OK (%u records, udp roundtrip, "
                      "router fan-in)\n", kRecords);
  return rc;
}
