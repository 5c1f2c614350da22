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
#include <sys/mman.h>
#include <sys/socket.h>
#include <sys/stat.h>
#include <unistd.h>

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

}  // extern "C"
