// IMU TCP bridge / replay server.
//
// The reference's live demo reads sensor frames from a separate Xsens MT SDK
// C++ process over TCP at 127.0.0.1:27015 (reference live_demo_new.py:72-139,
// README.md:149-151): each frame is 6 IMUs x (quaternion wxyz-or-xyzw + 3
// acc) = 42 ascii floats, space separated. This program speaks that exact
// wire protocol:
//
//   replay mode:  ./imu_bridge --replay frames.f32 [--port 27015] [--hz 60]
//     frames.f32 is raw little-endian float32, N x 42 (quat + acc per IMU).
//     Streams frames at the requested rate, looping at EOF. This is the
//     development/live-demo backend when no Xsens hardware is attached.
//
//   stdin mode:   ./imu_bridge --stdin [--port 27015]
//     Forwards whitespace-separated floats from stdin to the socket —
//     a shim for piping any real sensor SDK into the demo.
//
// Single client at a time; reconnects accepted in a loop.

#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

#include <chrono>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int kFloatsPerFrame = 42;

int Listen(int port) {
  int fd = socket(AF_INET, SOCK_STREAM, 0);
  if (fd < 0) return -1;
  int one = 1;
  setsockopt(fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (bind(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) < 0) {
    perror("bind");
    return -1;
  }
  if (listen(fd, 1) < 0) {
    perror("listen");
    return -1;
  }
  return fd;
}

bool SendAll(int fd, const std::string& s) {
  size_t off = 0;
  while (off < s.size()) {
    ssize_t n = send(fd, s.data() + off, s.size() - off, MSG_NOSIGNAL);
    if (n <= 0) return false;
    off += static_cast<size_t>(n);
  }
  return true;
}

std::string FormatFrame(const float* v) {
  char buf[16 * kFloatsPerFrame];
  char* p = buf;
  for (int i = 0; i < kFloatsPerFrame; i++) {
    p += snprintf(p, 16, "%.7g ", static_cast<double>(v[i]));
  }
  return std::string(buf, static_cast<size_t>(p - buf));
}

int RunReplay(const std::string& file, int port, double hz) {
  std::ifstream f(file, std::ios::binary);
  if (!f) {
    fprintf(stderr, "cannot open %s\n", file.c_str());
    return 1;
  }
  f.seekg(0, std::ios::end);
  size_t bytes = static_cast<size_t>(f.tellg());
  f.seekg(0);
  std::vector<float> frames(bytes / sizeof(float));
  f.read(reinterpret_cast<char*>(frames.data()),
         static_cast<std::streamsize>(bytes));
  size_t n_frames = frames.size() / kFloatsPerFrame;
  if (n_frames == 0) {
    fprintf(stderr, "no frames in %s\n", file.c_str());
    return 1;
  }

  int lfd = Listen(port);
  if (lfd < 0) return 1;
  fprintf(stderr, "imu_bridge: replaying %zu frames at %.1f Hz on port %d\n",
          n_frames, hz, port);

  const auto period = std::chrono::duration<double>(1.0 / hz);
  while (true) {
    int cfd = accept(lfd, nullptr, nullptr);
    if (cfd < 0) continue;
    int one = 1;
    setsockopt(cfd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
    auto next = std::chrono::steady_clock::now();
    for (size_t t = 0;; t = (t + 1) % n_frames) {
      if (!SendAll(cfd, FormatFrame(&frames[t * kFloatsPerFrame]))) break;
      next += std::chrono::duration_cast<std::chrono::steady_clock::duration>(
          period);
      std::this_thread::sleep_until(next);
    }
    close(cfd);
  }
}

int RunStdin(int port) {
  int lfd = Listen(port);
  if (lfd < 0) return 1;
  fprintf(stderr, "imu_bridge: forwarding stdin on port %d\n", port);
  while (true) {
    int cfd = accept(lfd, nullptr, nullptr);
    if (cfd < 0) continue;
    std::string line;
    while (std::getline(std::cin, line)) {
      line += ' ';
      if (!SendAll(cfd, line)) break;
    }
    close(cfd);
    if (std::cin.eof()) return 0;
  }
}

}  // namespace

int main(int argc, char** argv) {
  std::string replay;
  bool use_stdin = false;
  int port = 27015;
  double hz = 60.0;
  for (int i = 1; i < argc; i++) {
    std::string a = argv[i];
    if (a == "--replay" && i + 1 < argc) replay = argv[++i];
    else if (a == "--stdin") use_stdin = true;
    else if (a == "--port" && i + 1 < argc) port = atoi(argv[++i]);
    else if (a == "--hz" && i + 1 < argc) hz = atof(argv[++i]);
    else {
      fprintf(stderr,
              "usage: %s --replay frames.f32 [--port P] [--hz H] | --stdin\n",
              argv[0]);
      return 2;
    }
  }
  if (hz <= 0.0) {  // atof returns 0 for typos; 0/negative would hang/flood
    fprintf(stderr, "--hz must be a positive number (got %g)\n", hz);
    return 2;
  }
  if (use_stdin) return RunStdin(port);
  if (!replay.empty()) return RunReplay(replay, port, hz);
  fprintf(stderr, "need --replay or --stdin\n");
  return 2;
}
