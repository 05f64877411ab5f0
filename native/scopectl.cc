// Acquisition host daemon — TPU-native replacement for the reference's
// DigitalMicrograph C++ plugin + file-based RPC
// (machine_learning/Aquisition.cpp:63-198, em_env/em_env.py:70-122).
//
// A TCP server implementing the same 15-opcode instruction protocol
// (opcode table: reference em_env/em_env.py:47-62; wire format mirrors
// emx/scope/protocol.py). The camera is a seam: `SimCamera` reproduces
// the physics of emx/scope/sim.py (pure-phase specimen imaged through a
// defocus CTF via an in-house radix-2 FFT, Poisson shot noise), and a
// real Gatan DMSDK-backed camera can be slotted behind the same
// interface on the instrument PC.
//
// Wire protocol (newline-delimited, mirrors emx.scope.protocol.SocketTransport):
//   client: "EXEC <nbytes>\n" + <program text>
//   server: "STATE <nrows>\n" then per row either
//             "IMG <h> <w> <tag>\n" + h*w float32 (little-endian), or
//             "<code>,<value>[,<value>]\n"
//
// Build: make -C native    Run: ./native/build/scopectl <port> [size] [seed]

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <cmath>
#include <complex>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <random>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

namespace {

using cplx = std::complex<float>;

// ---------- tiny radix-2 FFT (power-of-two sizes) ---------------------------
void fft1d(cplx* a, int n, bool inverse) {
  for (int i = 1, j = 0; i < n; i++) {
    int bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (int len = 2; len <= n; len <<= 1) {
    float ang = 2.0f * float(M_PI) / len * (inverse ? 1 : -1);
    cplx wl(std::cos(ang), std::sin(ang));
    for (int i = 0; i < n; i += len) {
      cplx w(1.0f, 0.0f);
      for (int k = 0; k < len / 2; k++) {
        cplx u = a[i + k], v = a[i + k + len / 2] * w;
        a[i + k] = u + v;
        a[i + k + len / 2] = u - v;
        w *= wl;
      }
    }
  }
  if (inverse)
    for (int i = 0; i < n; i++) a[i] /= float(n);
}

void fft2d(std::vector<cplx>& img, int n, bool inverse) {
  std::vector<cplx> col(n);
  for (int r = 0; r < n; r++) fft1d(&img[r * n], n, inverse);
  for (int c = 0; c < n; c++) {
    for (int r = 0; r < n; r++) col[r] = img[r * n + c];
    fft1d(col.data(), n, inverse);
    for (int r = 0; r < n; r++) img[r * n + c] = col[r];
  }
}

// ---------- simulated microscope --------------------------------------------
struct SimCamera {
  int size;
  float x = 0, y = 0, z = 0, focus = 0;
  float beam_x = 0, beam_y = 0;
  float optimal_z = 0, defocus_per_z = 200.0f, dose = 2000.0f;
  float wavelength = 0.025f, phase_strength = 1.0f;
  std::mt19937_64 rng;
  std::vector<float> specimen;  // (4*size)^2 procedural phase map
  int spec_n;

  explicit SimCamera(int sz, uint64_t seed) : size(sz), rng(seed) {
    spec_n = 4 * size;
    specimen.resize(size_t(spec_n) * spec_n);
    std::mt19937_64 srng(seed * 7919 + 13);
    std::uniform_real_distribution<float> uni(0.0f, 1.0f);
    // Smooth background + sharp-edged sigmoid discs — mirrors
    // emx/scope/sim.py disc_specimen: the sharp phase edges make the
    // kurtosis-of-Laplacian focus metric well-posed (deep minimum at
    // focus); smooth-only specimens invert it.
    float f1 = 1.0f + 2.0f * uni(srng), ph1 = 2 * float(M_PI) * uni(srng);
    float f2 = 1.0f + 2.0f * uni(srng), ph2 = 2 * float(M_PI) * uni(srng);
    struct Disc { float cy, cx, r; };
    std::vector<Disc> discs;
    int n_disc = std::max(2, spec_n * spec_n / 384);
    for (int b = 0; b < n_disc; b++)
      discs.push_back({spec_n * uni(srng), spec_n * uni(srng),
                       3.0f + 6.0f * uni(srng)});
    const float soft = 0.7f, background = 0.3f;
    for (int r = 0; r < spec_n; r++) {
      for (int c = 0; c < spec_n; c++) {
        float yy = float(r), xx = float(c);
        float v = background *
                  (0.5f + 0.25f * std::sin(2 * float(M_PI) * f1 * xx / spec_n + ph1)
                        + 0.25f * std::sin(2 * float(M_PI) * f2 * yy / spec_n + ph2));
        for (const Disc& d : discs) {
          float dist = std::sqrt((yy - d.cy) * (yy - d.cy) +
                                 (xx - d.cx) * (xx - d.cx));
          v += 1.0f / (1.0f + std::exp((dist - d.r) / soft));
        }
        specimen[size_t(r) * spec_n + c] = v;
      }
    }
    // Normalise 0..1.
    float lo = 1e9f, hi = -1e9f;
    for (float v : specimen) { lo = std::min(lo, v); hi = std::max(hi, v); }
    for (float& v : specimen) v = (v - lo) / (hi - lo);
  }

  std::vector<float> acquire() {
    int big = spec_n;
    int cx = (int(x + beam_x) % std::max(1, big - size) + big) % std::max(1, big - size);
    int cy = (int(y + beam_y) % std::max(1, big - size) + big) % std::max(1, big - size);
    // Pure phase object -> wave = exp(i * strength * specimen window).
    std::vector<cplx> wave(size_t(size) * size);
    for (int r = 0; r < size; r++)
      for (int c = 0; c < size; c++) {
        float phv = phase_strength * specimen[size_t(cy + r) * big + (cx + c)];
        wave[size_t(r) * size + c] = cplx(std::cos(phv), std::sin(phv));
      }
    // Defocus CTF multiply in Fourier space: exp(i*pi*lambda*df*k^2).
    float df = (z - optimal_z) * defocus_per_z + focus;
    fft2d(wave, size, false);
    for (int r = 0; r < size; r++) {
      float ky = (r <= size / 2 ? r : r - size) / float(size);
      for (int c = 0; c < size; c++) {
        float kx = (c <= size / 2 ? c : c - size) / float(size);
        float phase = float(M_PI) * wavelength * df * (kx * kx + ky * ky);
        wave[size_t(r) * size + c] *= cplx(std::cos(phase), std::sin(phase));
      }
    }
    fft2d(wave, size, true);
    std::vector<float> img(size_t(size) * size);
    for (size_t i = 0; i < img.size(); i++) img[i] = std::norm(wave[i]);
    if (dose > 0) {
      double mean = 0;
      for (float v : img) mean += v;
      mean /= img.size();
      for (float& v : img) {
        double lam = std::max(0.0, double(v) * dose / std::max(mean, 1e-9));
        std::poisson_distribution<long> pois(lam);
        v = float(pois(rng));
      }
    }
    float lo = 1e9f, hi = -1e9f;
    for (float v : img) { lo = std::min(lo, v); hi = std::max(hi, v); }
    if (hi > lo)
      for (float& v : img) v = (v - lo) / (hi - lo);
    else
      for (float& v : img) v = 0.5f;
    return img;
  }
};

// ---------- protocol ---------------------------------------------------------
struct Row {
  std::string text;          // "code,value" row
  std::vector<float> image;  // non-empty for get_img rows
  std::string tag;
};

std::vector<Row> execute_program(SimCamera& cam, const std::string& program,
                                 bool* terminate) {
  std::vector<Row> rows;
  std::istringstream in(program);
  std::string line;
  auto next_arg = [&]() -> std::string {
    std::string a;
    std::getline(in, a);
    return a;
  };
  while (std::getline(in, line)) {
    if (line.empty()) continue;
    int op = std::atoi(line.c_str());
    char buf[96];
    switch (op) {
      case 0: {  // get_img
        Row r;
        r.tag = next_arg();
        if (r.tag.empty()) r.tag = "img";
        r.image = cam.acquire();
        rows.push_back(std::move(r));
        break;
      }
      case 1: cam.x += std::atof(next_arg().c_str());
        snprintf(buf, sizeof buf, "1,%g", cam.x); rows.push_back({buf, {}, ""}); break;
      case 2: cam.y += std::atof(next_arg().c_str());
        snprintf(buf, sizeof buf, "2,%g", cam.y); rows.push_back({buf, {}, ""}); break;
      case 3: cam.z += std::atof(next_arg().c_str());
        snprintf(buf, sizeof buf, "3,%g", cam.z); rows.push_back({buf, {}, ""}); break;
      case 4: {
        cam.beam_x += std::atof(next_arg().c_str());
        cam.beam_y += std::atof(next_arg().c_str());
        snprintf(buf, sizeof buf, "4,%g,%g", cam.beam_x, cam.beam_y);
        rows.push_back({buf, {}, ""});
        break;
      }
      case 5: cam.x = std::atof(next_arg().c_str());
        snprintf(buf, sizeof buf, "5,%g", cam.x); rows.push_back({buf, {}, ""}); break;
      case 6: cam.y = std::atof(next_arg().c_str());
        snprintf(buf, sizeof buf, "6,%g", cam.y); rows.push_back({buf, {}, ""}); break;
      case 7: cam.z = std::atof(next_arg().c_str());
        snprintf(buf, sizeof buf, "7,%g", cam.z); rows.push_back({buf, {}, ""}); break;
      case 8: snprintf(buf, sizeof buf, "8,%g", cam.x); rows.push_back({buf, {}, ""}); break;
      case 9: snprintf(buf, sizeof buf, "9,%g", cam.y); rows.push_back({buf, {}, ""}); break;
      case 10: snprintf(buf, sizeof buf, "10,%g", cam.z); rows.push_back({buf, {}, ""}); break;
      case 11: cam.focus += std::atof(next_arg().c_str());
        snprintf(buf, sizeof buf, "11,%g", cam.focus); rows.push_back({buf, {}, ""}); break;
      case 12: snprintf(buf, sizeof buf, "12,%g", cam.focus); rows.push_back({buf, {}, ""}); break;
      case 13: cam.focus = std::atof(next_arg().c_str());
        snprintf(buf, sizeof buf, "13,%g", cam.focus); rows.push_back({buf, {}, ""}); break;
      case 14: *terminate = true; rows.push_back({"14,terminated", {}, ""}); break;
      default: rows.push_back({"-1,unknown", {}, ""}); break;
    }
  }
  return rows;
}

bool read_exact(int fd, void* buf, size_t n) {
  uint8_t* b = static_cast<uint8_t*>(buf);
  while (n) {
    ssize_t r = read(fd, b, n);
    if (r <= 0) return false;
    b += r;
    n -= size_t(r);
  }
  return true;
}

bool write_all(int fd, const void* buf, size_t n) {
  const uint8_t* b = static_cast<const uint8_t*>(buf);
  while (n) {
    ssize_t w = write(fd, b, n);
    if (w <= 0) return false;
    b += w;
    n -= size_t(w);
  }
  return true;
}

bool read_line(int fd, std::string* out) {
  out->clear();
  char c;
  while (true) {
    ssize_t r = read(fd, &c, 1);
    if (r <= 0) return false;
    if (c == '\n') return true;
    out->push_back(c);
  }
}

std::mutex g_cam_mu;
// Listening socket, so a client-thread `terminate` can wake the main
// thread out of its blocking accept() (otherwise the daemon lingers
// until one more connection arrives).
int g_srv_fd = -1;

void serve_client(int fd, SimCamera& cam, std::atomic<bool>* terminate) {
  std::string line;
  while (!terminate->load() && read_line(fd, &line)) {
    if (line.rfind("EXEC ", 0) != 0) break;
    size_t nbytes = strtoull(line.c_str() + 5, nullptr, 10);
    if (nbytes > (64u << 20)) break;
    std::string program(nbytes, '\0');
    if (!read_exact(fd, program.data(), nbytes)) break;
    std::vector<Row> rows;
    {
      std::lock_guard<std::mutex> lock(g_cam_mu);
      bool term = false;
      rows = execute_program(cam, program, &term);
      if (term) terminate->store(true);
    }
    char hdr[64];
    snprintf(hdr, sizeof hdr, "STATE %zu\n", rows.size());
    if (!write_all(fd, hdr, strlen(hdr))) break;
    for (const Row& r : rows) {
      if (!r.image.empty()) {
        snprintf(hdr, sizeof hdr, "IMG %d %d %s\n", cam.size, cam.size,
                 r.tag.empty() ? "img" : r.tag.c_str());
        if (!write_all(fd, hdr, strlen(hdr))) return;
        if (!write_all(fd, r.image.data(), r.image.size() * 4)) return;
      } else {
        std::string row = r.text + "\n";
        if (!write_all(fd, row.data(), row.size())) return;
      }
    }
    if (terminate->load()) break;
  }
  close(fd);
  // The reply has been flushed; now unblock accept() so main can exit.
  if (terminate->load() && g_srv_fd >= 0) shutdown(g_srv_fd, SHUT_RDWR);
}

}  // namespace

int main(int argc, char** argv) {
  int port = argc > 1 ? std::atoi(argv[1]) : 9870;
  int size = argc > 2 ? std::atoi(argv[2]) : 64;
  uint64_t seed = argc > 3 ? strtoull(argv[3], nullptr, 10) : 0;
  float dose = argc > 4 ? float(std::atof(argv[4])) : 2000.0f;
  // FFT requires power-of-two frames.
  if (size & (size - 1)) {
    fprintf(stderr, "frame size must be a power of two\n");
    return 2;
  }
  SimCamera cam(size, seed);
  cam.dose = dose;

  int srv = socket(AF_INET, SOCK_STREAM, 0);
  g_srv_fd = srv;
  int one = 1;
  setsockopt(srv, SOL_SOCKET, SO_REUSEADDR, &one, sizeof one);
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  addr.sin_port = htons(uint16_t(port));
  if (bind(srv, reinterpret_cast<sockaddr*>(&addr), sizeof addr) != 0) {
    perror("bind");
    return 1;
  }
  if (listen(srv, 4) != 0) {
    perror("listen");
    return 1;
  }
  // Report the actual port (port 0 = ephemeral) on stdout for the client.
  socklen_t alen = sizeof addr;
  getsockname(srv, reinterpret_cast<sockaddr*>(&addr), &alen);
  printf("LISTENING %d\n", ntohs(addr.sin_port));
  fflush(stdout);

  std::atomic<bool> terminate{false};
  while (!terminate.load()) {
    int fd = accept(srv, nullptr, nullptr);
    if (fd < 0) break;
    std::thread(serve_client, fd, std::ref(cam), &terminate).detach();
  }
  close(srv);
  return 0;
}
