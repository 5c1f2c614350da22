// libsrbd_bridge — native IPC for the MPC runtime.
//
// The reference's entire inter-process surface is ROS1 TCPROS pub/sub:
// telemetry out (/solution_time, /srbd_constraint, /f*, markers), teleop in
// (/joy), and the CartesI/O whole-body-IK reference stream
// (SURVEY.md §5.8; reference cartesio.py:6-7, dsrbd_example.py:43-49).
// This library provides the same roles without ROS:
//
//   * UDP datagram pub/sub with a tiny topic-framed wire format
//     [u32 magic][u16 topic_len][topic bytes][u32 payload_len][payload]
//     — telemetry/reference streams to external consumers (plotters,
//     IK controllers, loggers) on the LAN or localhost.
//   * lock-free SPSC shared-memory ring buffer (shm_open + C11 atomics)
//     — zero-copy on-host streaming between the MPC process and a
//     co-located consumer at control-loop rates.
//
// Exposed with a C ABI for ctypes (no pybind11 dependency — see
// srbd_horizon_tpu/runtime/bridge.py).

#include <arpa/inet.h>
#include <atomic>
#include <cerrno>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <netinet/in.h>
#include <string>
#include <mutex>
#include <sys/mman.h>
#include <sys/socket.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x53524244;  // "SRBD"

struct Pub {
  int fd;
  sockaddr_in addr;
};

struct Sub {
  int fd;
};

// ---- shared-memory SPSC ring ----
struct RingHeader {
  std::atomic<uint64_t> head;  // write cursor (bytes)
  std::atomic<uint64_t> tail;  // read cursor (bytes)
  uint64_t capacity;           // data bytes
};

struct Ring {
  RingHeader* hdr;
  uint8_t* data;
  std::string name;
  bool owner;
  size_t total;
};

// ---- fleet command router ----
// N robots × UDP command streams fan IN to one per-robot slot table the
// MPC process snapshots once per tick; per-robot result rows fan OUT to
// each robot's last source address. The receive loop runs on a native
// thread (off the Python GIL); each slot is guarded by its own mutex
// (held for ~ns by the single writer and the once-per-tick snapshot
// reader — contention is negligible at these rates). This is the
// fleet-scale analog of the reference's per-robot ROS graph (one /joy +
// /cartesian/* set per process, SURVEY.md §5.8) — here ONE process
// serves B robots per tick.

constexpr uint32_t kCmdMagic = 0x464C5254;  // "FLRT"
constexpr uint32_t kResMagic = 0x464C5253;  // "FLRS"

struct CmdPacket {
  uint32_t magic;
  uint32_t robot_id;
  int32_t action;
  float vx, vy, wz;
};

struct Slot {
  std::mutex mu;  // guards everything below (held ~ns; receiver is the
                  // only writer, the per-tick snapshot the only reader)
  int32_t action = 0;
  float vx = 0, vy = 0, wz = 0;
  uint64_t count = 0;   // packets accepted
  sockaddr_in src{};    // last sender (for the result fan-out)
};

struct Router {
  int fd = -1;
  std::atomic<bool> stop{false};
  std::vector<Slot> slots;  // sized once at construction, never resized
  std::thread th;

  void loop() {
    CmdPacket pkt;
    while (!stop.load(std::memory_order_acquire)) {
      sockaddr_in from{};
      socklen_t fl = sizeof(from);
      ssize_t n = recvfrom(fd, &pkt, sizeof(pkt), 0, (sockaddr*)&from, &fl);
      if (n < 0) continue;  // SO_RCVTIMEO tick — re-check stop
      if (n != (ssize_t)sizeof(CmdPacket) || pkt.magic != kCmdMagic)
        continue;
      if (pkt.robot_id >= slots.size()) continue;
      Slot& s = slots[pkt.robot_id];
      std::lock_guard<std::mutex> lk(s.mu);
      s.action = pkt.action;
      s.vx = pkt.vx;
      s.vy = pkt.vy;
      s.wz = pkt.wz;
      s.count += 1;
      s.src = from;
    }
  }
};

}  // namespace

extern "C" {

// ---------------- UDP publisher ----------------

void* bridge_pub_create(const char* host, int port) {
  Pub* p = new Pub();
  p->fd = socket(AF_INET, SOCK_DGRAM, 0);
  if (p->fd < 0) {
    delete p;
    return nullptr;
  }
  memset(&p->addr, 0, sizeof(p->addr));
  p->addr.sin_family = AF_INET;
  p->addr.sin_port = htons((uint16_t)port);
  inet_pton(AF_INET, host, &p->addr.sin_addr);
  return p;
}

int bridge_pub_send(void* h, const char* topic, const void* data, int len) {
  Pub* p = (Pub*)h;
  uint16_t tlen = (uint16_t)strlen(topic);
  uint32_t plen = (uint32_t)len;
  size_t total = 4 + 2 + tlen + 4 + plen;
  std::string buf;
  buf.resize(total);
  char* w = buf.data();
  memcpy(w, &kMagic, 4);
  w += 4;
  memcpy(w, &tlen, 2);
  w += 2;
  memcpy(w, topic, tlen);
  w += tlen;
  memcpy(w, &plen, 4);
  w += 4;
  memcpy(w, data, plen);
  ssize_t n = sendto(p->fd, buf.data(), total, 0, (sockaddr*)&p->addr,
                     sizeof(p->addr));
  return n == (ssize_t)total ? 0 : -1;
}

void bridge_pub_destroy(void* h) {
  Pub* p = (Pub*)h;
  if (p) {
    close(p->fd);
    delete p;
  }
}

// ---------------- UDP subscriber ----------------

void* bridge_sub_create(int port) {
  Sub* s = new Sub();
  s->fd = socket(AF_INET, SOCK_DGRAM, 0);
  if (s->fd < 0) {
    delete s;
    return nullptr;
  }
  int one = 1;
  setsockopt(s->fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons((uint16_t)port);
  addr.sin_addr.s_addr = INADDR_ANY;
  if (bind(s->fd, (sockaddr*)&addr, sizeof(addr)) < 0) {
    close(s->fd);
    delete s;
    return nullptr;
  }
  return s;
}

// Returns payload length, or -1 on timeout/error. topic_buf gets the
// NUL-terminated topic.
int bridge_sub_poll(void* h, char* topic_buf, int topic_cap, void* buf,
                    int buf_cap, int timeout_ms) {
  Sub* s = (Sub*)h;
  timeval tv{timeout_ms / 1000, (timeout_ms % 1000) * 1000};
  fd_set rfds;
  FD_ZERO(&rfds);
  FD_SET(s->fd, &rfds);
  int r = select(s->fd + 1, &rfds, nullptr, nullptr, &tv);
  if (r <= 0) return -1;
  char pkt[65536];
  ssize_t n = recv(s->fd, pkt, sizeof(pkt), 0);
  if (n < 10) return -1;
  uint32_t magic;
  memcpy(&magic, pkt, 4);
  if (magic != kMagic) return -1;
  uint16_t tlen;
  memcpy(&tlen, pkt + 4, 2);
  if (6 + tlen + 4 > n) return -1;
  int tcopy = tlen < topic_cap - 1 ? tlen : topic_cap - 1;
  memcpy(topic_buf, pkt + 6, tcopy);
  topic_buf[tcopy] = 0;
  uint32_t plen;
  memcpy(&plen, pkt + 6 + tlen, 4);
  if (6 + tlen + 4 + plen > (uint32_t)n) return -1;
  int pcopy = (int)plen < buf_cap ? (int)plen : buf_cap;
  memcpy(buf, pkt + 6 + tlen + 4, pcopy);
  return pcopy;
}

void bridge_sub_destroy(void* h) {
  Sub* s = (Sub*)h;
  if (s) {
    close(s->fd);
    delete s;
  }
}

// ---------------- shared-memory SPSC ring ----------------

void* ring_create(const char* name, uint64_t capacity, int create) {
  size_t total = sizeof(RingHeader) + capacity;
  int flags = create ? (O_CREAT | O_RDWR) : O_RDWR;
  int fd = shm_open(name, flags, 0600);
  if (fd < 0) return nullptr;
  if (create && ftruncate(fd, (off_t)total) != 0) {
    close(fd);
    return nullptr;
  }
  void* mem = mmap(nullptr, total, PROT_READ | PROT_WRITE, MAP_SHARED, fd, 0);
  close(fd);
  if (mem == MAP_FAILED) return nullptr;
  Ring* r = new Ring();
  r->hdr = (RingHeader*)mem;
  r->data = (uint8_t*)mem + sizeof(RingHeader);
  r->name = name;
  r->owner = create != 0;
  r->total = total;
  if (create) {
    r->hdr->head.store(0);
    r->hdr->tail.store(0);
    r->hdr->capacity = capacity;
  }
  return r;
}

// Push one length-prefixed record; returns 0 on success, -1 if full.
int ring_push(void* h, const void* data, uint32_t len) {
  Ring* r = (Ring*)h;
  uint64_t cap = r->hdr->capacity;
  uint64_t head = r->hdr->head.load(std::memory_order_relaxed);
  uint64_t tail = r->hdr->tail.load(std::memory_order_acquire);
  uint64_t need = 4 + (uint64_t)len;
  if (cap - (head - tail) < need) return -1;
  for (uint32_t i = 0; i < 4; i++)
    r->data[(head + i) % cap] = ((uint8_t*)&len)[i];
  for (uint32_t i = 0; i < len; i++)
    r->data[(head + 4 + i) % cap] = ((const uint8_t*)data)[i];
  r->hdr->head.store(head + need, std::memory_order_release);
  return 0;
}

// Pop one record; returns its length, 0 if empty, -1 if buffer too small.
int ring_pop(void* h, void* buf, uint32_t buf_cap) {
  Ring* r = (Ring*)h;
  uint64_t cap = r->hdr->capacity;
  uint64_t tail = r->hdr->tail.load(std::memory_order_relaxed);
  uint64_t head = r->hdr->head.load(std::memory_order_acquire);
  if (head == tail) return 0;
  uint32_t len;
  for (uint32_t i = 0; i < 4; i++)
    ((uint8_t*)&len)[i] = r->data[(tail + i) % cap];
  if (len > buf_cap) return -1;
  for (uint32_t i = 0; i < len; i++)
    ((uint8_t*)buf)[i] = r->data[(tail + 4 + i) % cap];
  r->hdr->tail.store(tail + 4 + len, std::memory_order_release);
  return (int)len;
}

void ring_destroy(void* h) {
  Ring* r = (Ring*)h;
  if (!r) return;
  munmap((void*)r->hdr, r->total);
  if (r->owner) shm_unlink(r->name.c_str());
  delete r;
}

// ---------------- fleet command router ----------------

// Bind `port`, allocate `n_robots` command slots, start the receive
// thread. Returns a handle or nullptr.
void* router_create(int port, int n_robots) {
  if (n_robots <= 0) return nullptr;
  Router* r = new Router();
  r->slots = std::vector<Slot>((size_t)n_robots);
  r->fd = socket(AF_INET, SOCK_DGRAM, 0);
  if (r->fd < 0) {
    delete r;
    return nullptr;
  }
  int one = 1;
  setsockopt(r->fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  int rcvbuf = 1 << 22;  // burst headroom for thousands of clients
  setsockopt(r->fd, SOL_SOCKET, SO_RCVBUF, &rcvbuf, sizeof(rcvbuf));
  timeval tv{0, 100000};  // 100 ms recv timeout: the stop-flag poll rate
  setsockopt(r->fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons((uint16_t)port);
  addr.sin_addr.s_addr = INADDR_ANY;
  if (bind(r->fd, (sockaddr*)&addr, sizeof(addr)) < 0) {
    close(r->fd);
    delete r;
    return nullptr;
  }
  r->th = std::thread([r] { r->loop(); });
  return r;
}

// Copy every slot's latest command into out (n_robots × 4 floats:
// action, vx, vy, wz) and counts (n_robots uint64, total packets
// accepted per robot). Returns the number of robots heard from so far.
int router_snapshot(void* h, float* out, uint64_t* counts) {
  Router* r = (Router*)h;
  int seen = 0;
  for (size_t i = 0; i < r->slots.size(); i++) {
    Slot& s = r->slots[i];
    std::lock_guard<std::mutex> lk(s.mu);
    out[4 * i + 0] = (float)s.action;
    out[4 * i + 1] = s.vx;
    out[4 * i + 2] = s.vy;
    out[4 * i + 3] = s.wz;
    counts[i] = s.count;
    if (s.count > 0) seen++;
  }
  return seen;
}

// Fan per-robot result rows back out: rows is n_robots × n_vals floats;
// each robot that has ever sent a command gets one datagram
// [kResMagic, robot_id, n_vals, vals...] at its last source address.
// Returns the number of datagrams sent.
int router_send_results(void* h, const float* rows, int n_vals) {
  Router* r = (Router*)h;
  if (n_vals < 0 || n_vals > 16000) return -1;
  std::string buf;
  buf.resize(12 + 4 * (size_t)n_vals);
  int sent = 0;
  for (size_t i = 0; i < r->slots.size(); i++) {
    sockaddr_in dst{};
    {
      Slot& s = r->slots[i];
      std::lock_guard<std::mutex> lk(s.mu);
      if (s.count == 0) continue;
      dst = s.src;
    }
    char* w = buf.data();
    memcpy(w, &kResMagic, 4);
    uint32_t id = (uint32_t)i;
    memcpy(w + 4, &id, 4);
    uint32_t nv = (uint32_t)n_vals;
    memcpy(w + 8, &nv, 4);
    memcpy(w + 12, rows + (size_t)i * n_vals, 4 * (size_t)n_vals);
    if (sendto(r->fd, buf.data(), buf.size(), 0, (sockaddr*)&dst,
               sizeof(dst)) == (ssize_t)buf.size())
      sent++;
  }
  return sent;
}

void router_destroy(void* h) {
  Router* r = (Router*)h;
  if (!r) return;
  r->stop.store(true, std::memory_order_release);
  if (r->th.joinable()) r->th.join();
  close(r->fd);
  delete r;
}

}  // extern "C"
