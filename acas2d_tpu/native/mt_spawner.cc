// Native batch episode-spawner: CPython-exact Mersenne Twister stream.
//
// The parity path of the framework injects episode initial conditions drawn
// from Python's global `random` stream (the reference seeds it once per
// process, training_main.py:14, and ACAS2DGame.__init__ consumes draws in a
// fixed order, game.py:41-114 — see oracle.MersenneSpawner for the
// draw-order contract).  Generating millions of episode spawns through the
// Python random module is interpreter-bound; this translation unit
// implements the identical bit stream natively:
//
//   * MT19937 core (genrand_uint32 / init_by_array) after the reference
//     implementation by Matsumoto & Nishimura, which CPython's
//     _randommodule.c embeds verbatim — so states coincide;
//   * random(): the 53-bit double construction (a>>5)*2^26+(b>>6) / 2^53;
//   * getrandbits(k<=32): one genrand word, top k bits;
//   * _randbelow(n): rejection loop over getrandbits(bit_length(n)) —
//     CPython Random._randbelow_with_getrandbits, including its
//     variable-length stream consumption (n==1 keeps drawing until 0!);
//   * uniform(a,b) = a + (b-a)*random().
//
// Exported via a C ABI for ctypes (no pybind11 in this image).  Verified
// bit-identical to random.Random in tests/test_native.py.

#include <cstdint>
#include <cstring>

namespace {

constexpr int N = 624;
constexpr int M = 397;
constexpr uint32_t MATRIX_A = 0x9908b0dfUL;
constexpr uint32_t UPPER_MASK = 0x80000000UL;
constexpr uint32_t LOWER_MASK = 0x7fffffffUL;

struct MT {
  uint32_t mt[N];
  int mti;

  void init_genrand(uint32_t s) {
    mt[0] = s;
    for (mti = 1; mti < N; mti++) {
      mt[mti] = 1812433253UL * (mt[mti - 1] ^ (mt[mti - 1] >> 30)) + mti;
    }
  }

  void init_by_array(const uint32_t* init_key, int key_length) {
    init_genrand(19650218UL);
    int i = 1, j = 0;
    int k = (N > key_length ? N : key_length);
    for (; k; k--) {
      mt[i] = (mt[i] ^ ((mt[i - 1] ^ (mt[i - 1] >> 30)) * 1664525UL)) +
              init_key[j] + j;
      i++; j++;
      if (i >= N) { mt[0] = mt[N - 1]; i = 1; }
      if (j >= key_length) j = 0;
    }
    for (k = N - 1; k; k--) {
      mt[i] = (mt[i] ^ ((mt[i - 1] ^ (mt[i - 1] >> 30)) * 1566083941UL)) - i;
      i++;
      if (i >= N) { mt[0] = mt[N - 1]; i = 1; }
    }
    mt[0] = 0x80000000UL;
  }

  uint32_t genrand_uint32() {
    uint32_t y;
    static const uint32_t mag01[2] = {0x0UL, MATRIX_A};
    if (mti >= N) {
      int kk;
      for (kk = 0; kk < N - M; kk++) {
        y = (mt[kk] & UPPER_MASK) | (mt[kk + 1] & LOWER_MASK);
        mt[kk] = mt[kk + M] ^ (y >> 1) ^ mag01[y & 0x1UL];
      }
      for (; kk < N - 1; kk++) {
        y = (mt[kk] & UPPER_MASK) | (mt[kk + 1] & LOWER_MASK);
        mt[kk] = mt[kk + (M - N)] ^ (y >> 1) ^ mag01[y & 0x1UL];
      }
      y = (mt[N - 1] & UPPER_MASK) | (mt[0] & LOWER_MASK);
      mt[N - 1] = mt[M - 1] ^ (y >> 1) ^ mag01[y & 0x1UL];
      mti = 0;
    }
    y = mt[mti++];
    y ^= (y >> 11);
    y ^= (y << 7) & 0x9d2c5680UL;
    y ^= (y << 15) & 0xefc60000UL;
    y ^= (y >> 18);
    return y;
  }

  // CPython random_random(): 53-bit double in [0, 1).
  double random() {
    uint32_t a = genrand_uint32() >> 5, b = genrand_uint32() >> 6;
    return (a * 67108864.0 + b) * (1.0 / 9007199254740992.0);
  }

  // CPython getrandbits for k in [1, 32].
  uint32_t getrandbits(int k) { return genrand_uint32() >> (32 - k); }

  // CPython Random._randbelow_with_getrandbits.
  uint32_t randbelow(uint32_t n) {
    if (n == 0) return 0;
    int k = 32 - __builtin_clz(n);  // n.bit_length()
    uint32_t r = getrandbits(k);
    while (r >= n) r = getrandbits(k);
    return r;
  }

  // random.randint(a, b) == randrange(a, b+1).
  int64_t randint(int64_t a, int64_t b) {
    return a + static_cast<int64_t>(randbelow(static_cast<uint32_t>(b - a + 1)));
  }

  double uniform(double a, double b) { return a + (b - a) * random(); }
};

}  // namespace

extern "C" {

// Opaque stream handle -------------------------------------------------------
void* mt_new(uint32_t seed) {
  MT* s = new MT();
  // CPython random.seed(int): key = abs(seed) split into 32-bit words.
  uint32_t key[1] = {seed};
  s->init_by_array(key, 1);
  return s;
}

void mt_free(void* h) { delete static_cast<MT*>(h); }

double mt_random(void* h) { return static_cast<MT*>(h)->random(); }
double mt_uniform(void* h, double a, double b) {
  return static_cast<MT*>(h)->uniform(a, b);
}
int64_t mt_randint(void* h, int64_t a, int64_t b) {
  return static_cast<MT*>(h)->randint(a, b);
}

// Batched episode spawn ------------------------------------------------------
// Replays the reference spawn draw order (game.py:41-114) `count` times,
// after discarding `skip` spawns.  Output arrays must hold `count` elements
// (num_traffic, player_psi) and `count*max_traffic` (traffic_*).
// relative_angle(player->goal) is passed in as `bearing` (it is a constant
// of the geometry; 0.0 for the default params).
void mt_spawn_batch(void* h, int64_t skip, int64_t count,
                    // params
                    int64_t min_traffic, int64_t max_traffic,
                    double width, double height,
                    double collision_radius, double aircraft_size,
                    double airspeed, double f_min, double f_max,
                    double player_heading_lim, double traffic_heading_lim,
                    double bearing,
                    // outputs
                    int32_t* num_traffic, double* player_psi,
                    double* traffic_x, double* traffic_y,
                    double* traffic_v, double* traffic_psi) {
  MT* s = static_cast<MT*>(h);
  for (int64_t i = -skip; i < count; i++) {
    bool record = i >= 0;
    int64_t nt = s->randint(min_traffic, max_traffic);     // game.py:41
    s->uniform(0.0, 360.0);                                // game.py:88 (discarded)
    double psi = bearing + s->uniform(-player_heading_lim, player_heading_lim);
    psi = psi - 360.0 * static_cast<int64_t>(psi / 360.0); // fmod toward zero
    if (psi < 0) psi += 360.0;                             // Python % semantics
    if (record) {
      num_traffic[i] = static_cast<int32_t>(nt);
      player_psi[i] = psi;
    }
    for (int64_t n = 0; n < nt; n++) {
      double tx, ty, tv, tpsi;
      if (n == 0) {                                        // game.py:98-106
        int64_t starts_down = s->randint(0, 1);
        tx = width - collision_radius;
        ty = collision_radius + starts_down * (height - 2 * collision_radius);
        tv = s->uniform(f_min, f_max) * airspeed;
        tpsi = 145.0 + starts_down * 70.0 +
               s->uniform(-traffic_heading_lim, traffic_heading_lim);
        if (tpsi >= 360.0) tpsi -= 360.0;
        if (tpsi < 0.0) tpsi += 360.0;
      } else {                                             // game.py:107-114
        tx = s->uniform(0.0, width - aircraft_size);
        ty = s->uniform(0.0, 3.0 * height / 5.0);
        tv = s->uniform(f_min, f_max) * airspeed;
        tpsi = s->uniform(0.0, 360.0);
      }
      if (record) {
        int64_t off = i * max_traffic + n;
        traffic_x[off] = tx;
        traffic_y[off] = ty;
        traffic_v[off] = tv;
        traffic_psi[off] = tpsi;
      }
    }
    if (record) {
      // zero inert slots
      for (int64_t n = nt; n < max_traffic; n++) {
        int64_t off = i * max_traffic + n;
        traffic_x[off] = 0.0;
        traffic_y[off] = 0.0;
        traffic_v[off] = airspeed;
        traffic_psi[off] = 0.0;
      }
    }
  }
}

}  // extern "C"
