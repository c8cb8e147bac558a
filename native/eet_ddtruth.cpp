// Native twin of ephemeris_explorer_tpu/truth_np.py: the double-double
// (dd, ~2^-106) force + state ELM2 truth stepper for the accuracy harness.
//
// BITWISE CONTRACT: every function reproduces the numpy reference
// operation-for-operation (same expression trees, same association, same
// tree-reduction order), so a chunk stepped here is bit-identical to the
// same chunk stepped by truth_np.elm2_step.  That requires strict IEEE-754
// binary64 semantics with round-to-nearest and NO fused-multiply-add
// contraction: build with `-ffp-contract=off` and never with -ffast-math.
// The Python loader (ephemeris_explorer_tpu/ddtruth_native.py) verifies the
// contract at load time by comparing one native force eval + a short chunk
// against the numpy twin bitwise, and refuses the library on any mismatch
// (a mis-built .so degrades to the numpy path, never to silent drift).
//
// Why this exists: the century accuracy audit (tools/accuracy_audit.py
// --truth ddf) integrates ~5e6 truth steps; numpy pays per-ufunc dispatch
// on (32, 32) grids, which made the 100-year truth an hours-long CPU run.
// The identical arithmetic in compiled scalar form is dispatch-free.
//
// Algorithm citations live in the numpy/jnp twins (truth_np.py, ops/eft.py,
// integrators/multistep.py); the error-free transforms are Knuth two_sum
// and Dekker split/two_prod.  Reference fixture being out-precisioned:
// /root/reference/ephemeris/tests/solar_system_convergence.rs:12-110.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct TF {
    double hi, lo;
};

// ---------------------------------------------------------------------------
// Error-free transforms (mirrors truth_np.py lines 44-79 exactly)
// ---------------------------------------------------------------------------

constexpr double SPLIT = 134217729.0;  // 2^27 + 1 (Dekker splitter)

inline void two_sum(double a, double b, double &s, double &err) {
    s = a + b;
    double bb = s - a;
    err = (a - (s - bb)) + (b - bb);
}

inline void quick_two_sum(double a, double b, double &s, double &err) {
    s = a + b;
    err = b - (s - a);
}

inline void split(double a, double &hi, double &lo) {
    double c = SPLIT * a;
    hi = c - (c - a);
    lo = a - hi;
}

inline void two_prod(double a, double b, double &p, double &err) {
    p = a * b;
    double ah, al, bh, bl;
    split(a, ah, al);
    split(b, bh, bl);
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl;
}

inline void two_sqr(double a, double &p, double &err) {
    p = a * a;
    double hi, lo;
    split(a, hi, lo);
    err = ((hi * hi - p) + 2.0 * (hi * lo)) + lo * lo;
}

// ---------------------------------------------------------------------------
// TwoFloat arithmetic (mirrors truth_np.py lines 86-146 exactly)
// ---------------------------------------------------------------------------

inline TF dd_add(TF x, TF y) {
    double s, e, t, f;
    two_sum(x.hi, y.hi, s, e);
    two_sum(x.lo, y.lo, t, f);
    e = e + t;
    quick_two_sum(s, e, s, e);
    e = e + f;
    TF r;
    quick_two_sum(s, e, r.hi, r.lo);
    return r;
}

inline TF dd_sub(TF x, TF y) { return dd_add(x, TF{-y.hi, -y.lo}); }

inline TF dd_mul(TF x, TF y) {
    double p, e;
    two_prod(x.hi, y.hi, p, e);
    e = e + (x.hi * y.lo + x.lo * y.hi);
    TF r;
    quick_two_sum(p, e, r.hi, r.lo);
    return r;
}

inline TF dd_mul_float(TF x, double b) {
    double p, e;
    two_prod(x.hi, b, p, e);
    e = e + x.lo * b;
    TF r;
    quick_two_sum(p, e, r.hi, r.lo);
    return r;
}

inline TF dd_float_mul(double a, double b) {
    TF r;
    two_prod(a, b, r.hi, r.lo);
    return r;
}

inline TF dd_sqr(TF x) {
    double p, e;
    two_sqr(x.hi, p, e);
    e = e + 2.0 * (x.hi * x.lo);
    TF r;
    quick_two_sum(p, e, r.hi, r.lo);
    return r;
}

inline TF dd_add_scalar(TF x, double b) {
    double s, e;
    two_sum(x.hi, b, s, e);
    e = e + x.lo;
    TF r;
    quick_two_sum(s, e, r.hi, r.lo);
    return r;
}

inline TF dd_rsqrt(TF x) {
    // Two Newton refinements of the f64 seed (truth_np.rsqrt).
    double y0 = 1.0 / std::sqrt(x.hi);
    TF y0_tf{y0, 0.0};
    TF xy2 = dd_mul(x, dd_float_mul(y0, y0));
    TF corr = dd_add_scalar(dd_mul_float(xy2, -0.5), 1.5);
    TF y1 = dd_mul(y0_tf, corr);
    xy2 = dd_mul(x, dd_mul(y1, y1));
    corr = dd_add_scalar(dd_mul_float(xy2, -0.5), 1.5);
    return dd_mul(y1, corr);
}

// ---------------------------------------------------------------------------
// dd-force pairwise kernel (mirrors truth_np.pairwise_accel_dd)
// ---------------------------------------------------------------------------

// One output row i: acc[i] = sum_j mu[j] * (p[j] - p[i]) / |p[j] - p[i]|^3.
// The column reduction follows truth_np.tree_sum exactly: pad the n terms
// with dd zeros to the next power of two, then halve (t[j] += t[j+half]).
//
// Layout: structure-of-arrays hi/lo columns, and the j==i diagonal handled
// by scalar fixups BETWEEN branch-free passes, so each pass is a straight-
// line FP loop the compiler can auto-vectorize (AVX-512: 8 lanes of the
// whole dd chain).  Bitwise unchanged vs the scalar form: all ops are
// element-wise and the diagonal replacement happens at the same points as
// truth_np's where(eye, ...) masks.
struct Scratch {
    std::vector<double> dc_hi, dc_lo;  // (3, n)
    std::vector<double> r2_hi, r2_lo;  // (n)
    std::vector<double> w_hi, w_lo;    // (n)
    std::vector<double> t_hi, t_lo;    // (m)
    void ensure(int64_t n, int64_t m) {
        if ((int64_t)dc_hi.size() < 3 * n) {
            dc_hi.resize(3 * n);
            dc_lo.resize(3 * n);
        }
        if ((int64_t)r2_hi.size() < n) {
            r2_hi.resize(n);
            r2_lo.resize(n);
            w_hi.resize(n);
            w_lo.resize(n);
        }
        if ((int64_t)t_hi.size() < m) {
            t_hi.resize(m);
            t_lo.resize(m);
        }
    }
};

void accel_row(int64_t n, int64_t i, const double *pos_hi, const double *pos_lo,
               const double *mu, double *acc_hi, double *acc_lo, Scratch &sc,
               int64_t m) {
    double *dchi = sc.dc_hi.data(), *dclo = sc.dc_lo.data();
    double *r2hi = sc.r2_hi.data(), *r2lo = sc.r2_lo.data();
    double *whi = sc.w_hi.data(), *wlo = sc.w_lo.data();
    double *thi = sc.t_hi.data(), *tlo = sc.t_lo.data();
    const double pihc[3] = {pos_hi[i * 3], pos_hi[i * 3 + 1], pos_hi[i * 3 + 2]};
    const double pilc[3] = {pos_lo[i * 3], pos_lo[i * 3 + 1], pos_lo[i * 3 + 2]};

    // pass 1 (branch-free): pair differences + squared distance
    for (int64_t j = 0; j < n; ++j) {
        TF d[3];
        for (int c = 0; c < 3; ++c) {
            TF pj{pos_hi[j * 3 + c], pos_lo[j * 3 + c]};
            d[c] = dd_sub(pj, TF{pihc[c], pilc[c]});
            dchi[c * n + j] = d[c].hi;
            dclo[c * n + j] = d[c].lo;
        }
        TF r2 = dd_add(dd_add(dd_sqr(d[0]), dd_sqr(d[1])), dd_sqr(d[2]));
        r2hi[j] = r2.hi;
        r2lo[j] = r2.lo;
    }
    r2hi[i] = 1.0;  // where(eye, 1, r2)
    r2lo[i] = 0.0;

    // pass 2 (branch-free): u = r2^-1/2, w = mu * u^3
    for (int64_t j = 0; j < n; ++j) {
        TF u = dd_rsqrt(TF{r2hi[j], r2lo[j]});
        TF u3 = dd_mul(dd_sqr(u), u);
        TF w = dd_mul_float(u3, mu[j]);
        whi[j] = w.hi;
        wlo[j] = w.lo;
    }
    whi[i] = 0.0;  // where(eye, 0, w)
    wlo[i] = 0.0;

    // pass 3 per component: terms + power-of-two halving tree reduction
    for (int c = 0; c < 3; ++c) {
        for (int64_t j = 0; j < n; ++j) {
            TF t = dd_mul(TF{whi[j], wlo[j]}, TF{dchi[c * n + j], dclo[c * n + j]});
            thi[j] = t.hi;
            tlo[j] = t.lo;
        }
        for (int64_t j = n; j < m; ++j) {
            thi[j] = 0.0;
            tlo[j] = 0.0;
        }
        for (int64_t len = m; len > 1; len /= 2) {
            int64_t half = len / 2;
            for (int64_t j = 0; j < half; ++j) {
                TF s = dd_add(TF{thi[j], tlo[j]}, TF{thi[j + half], tlo[j + half]});
                thi[j] = s.hi;
                tlo[j] = s.lo;
            }
        }
        acc_hi[i * 3 + c] = thi[0];
        acc_lo[i * 3 + c] = tlo[0];
    }
}

void pairwise_accel_dd(int64_t n, const double *pos_hi, const double *pos_lo,
                       const double *mu, double *acc_hi, double *acc_lo,
                       std::vector<Scratch> &scratch, int n_threads) {
    int64_t m = 1;
    while (m < n) m *= 2;
    if (n_threads <= 1 || n < 2 * n_threads) {
        scratch[0].ensure(n, m);
        for (int64_t i = 0; i < n; ++i)
            accel_row(n, i, pos_hi, pos_lo, mu, acc_hi, acc_lo, scratch[0], m);
        return;
    }
    // Rows are independent; any partition gives bitwise-identical output.
    std::vector<std::thread> ts;
    int64_t per = (n + n_threads - 1) / n_threads;
    for (int k = 0; k < n_threads; ++k) {
        int64_t lo = k * per, hi = std::min(n, lo + per);
        if (lo >= hi) break;
        scratch[k].ensure(n, m);
        Scratch &s = scratch[k];
        ts.emplace_back([=, &s]() {
            for (int64_t i = lo; i < hi; ++i)
                accel_row(n, i, pos_hi, pos_lo, mu, acc_hi, acc_lo, s, m);
        });
    }
    for (auto &t : ts) t.join();
}

// sum_j coeffs[j] * stack[j], element-wise, in dd (truth_np._wsum): iterate
// j ascending, skip exact-zero coefficients, first surviving term
// initialises.  j-outer / element-inner so each pass is a branch-free
// vectorizable loop (same per-element operation order as the numpy twin,
// which is also j-outer over full arrays).
void wsum_ring(int64_t order, int64_t row, const double *coeffs,
               const double *st_hi, const double *st_lo, double *out_hi,
               double *out_lo) {
    bool first = true;
    for (int64_t j = 0; j < order; ++j) {
        double c = coeffs[j];
        if (c == 0.0) continue;
        const double *sh = st_hi + j * row;
        const double *sl = st_lo + j * row;
        if (first) {
            for (int64_t e = 0; e < row; ++e) {
                TF t = dd_mul_float(TF{sh[e], sl[e]}, c);
                out_hi[e] = t.hi;
                out_lo[e] = t.lo;
            }
            first = false;
        } else {
            for (int64_t e = 0; e < row; ++e) {
                TF t = dd_mul_float(TF{sh[e], sl[e]}, c);
                TF a = dd_add(TF{out_hi[e], out_lo[e]}, t);
                out_hi[e] = a.hi;
                out_lo[e] = a.lo;
            }
        }
    }
}

}  // namespace

extern "C" {

// One dd force evaluation (test surface for the bitwise gate).
void eet_ddtruth_force(int64_t n, const double *pos_hi, const double *pos_lo,
                       const double *mu, double *acc_hi, double *acc_lo,
                       int n_threads) {
    if (n_threads < 1) n_threads = 1;
    std::vector<Scratch> scratch(n_threads);
    pairwise_accel_dd(n, pos_hi, pos_lo, mu, acc_hi, acc_lo, scratch, n_threads);
}

// n_steps of truth_np.elm2_step in place.  Scalars h2_over_beta_d
// (= h*h/beta_d), inv_h (= 1.0/h) and h_over_cowell_beta_d (= h/cowell_beta_d)
// are precomputed by the Python caller with the same f64 expressions the
// numpy stepper evaluates, so association is identical.
// Rings ys/ddys are (order, n, 3) newest-first, dy is (n, 3); t_io is the
// scalar time, accumulated t += h per step exactly like the numpy CarryDD.
void eet_ddtruth_chunk(int64_t order, int64_t n, const double *c_y,
                       const double *c_dy, const double *cowell_beta_n,
                       double h2_over_beta_d, double inv_h,
                       double h_over_cowell_beta_d, double h, const double *mu,
                       int64_t n_steps, double *t_io, double *ys_hi,
                       double *ys_lo, double *ddys_hi, double *ddys_lo,
                       double *dy_hi, double *dy_lo, int n_threads) {
    if (n_threads < 1) n_threads = 1;
    const int64_t row = n * 3;
    std::vector<Scratch> scratch(n_threads);
    std::vector<double> ynew_hi(row), ynew_lo(row), acc_hi(row), acc_lo(row);
    std::vector<double> s1_hi(row), s1_lo(row), s2_hi(row), s2_lo(row);
    double t = *t_io;

    for (int64_t s = 0; s < n_steps; ++s) {
        // y_new = sum_j c_y[j] ys[j]  +  (h^2/beta_d) * sum_j c_dy[j] ddys[j]
        wsum_ring(order, row, c_y, ys_hi, ys_lo, s1_hi.data(), s1_lo.data());
        wsum_ring(order, row, c_dy, ddys_hi, ddys_lo, s2_hi.data(), s2_lo.data());
        for (int64_t e = 0; e < row; ++e) {
            TF yn = dd_add(TF{s1_hi[e], s1_lo[e]},
                           dd_mul_float(TF{s2_hi[e], s2_lo[e]}, h2_over_beta_d));
            ynew_hi[e] = yn.hi;
            ynew_lo[e] = yn.lo;
        }
        t = t + h;

        pairwise_accel_dd(n, ynew_hi.data(), ynew_lo.data(), mu, acc_hi.data(),
                          acc_lo.data(), scratch, n_threads);

        // Shift the ddys ring (drop oldest, insert the new force at [0]).
        std::memmove(ddys_hi + row, ddys_hi, (order - 1) * row * sizeof(double));
        std::memmove(ddys_lo + row, ddys_lo, (order - 1) * row * sizeof(double));
        std::memcpy(ddys_hi, acc_hi.data(), row * sizeof(double));
        std::memcpy(ddys_lo, acc_lo.data(), row * sizeof(double));

        // Cowell velocity: dy = (y_new - y_prev)/h + (h/cbeta_d) * sum(cbeta ddys)
        wsum_ring(order, row, cowell_beta_n, ddys_hi, ddys_lo, s1_hi.data(),
                  s1_lo.data());
        for (int64_t e = 0; e < row; ++e) {
            TF y_prev{ys_hi[e], ys_lo[e]};
            TF yn{ynew_hi[e], ynew_lo[e]};
            TF dyn = dd_add(dd_mul_float(dd_sub(yn, y_prev), inv_h),
                            dd_mul_float(TF{s1_hi[e], s1_lo[e]},
                                         h_over_cowell_beta_d));
            dy_hi[e] = dyn.hi;
            dy_lo[e] = dyn.lo;
        }

        // Shift the ys ring and insert y_new.
        std::memmove(ys_hi + row, ys_hi, (order - 1) * row * sizeof(double));
        std::memmove(ys_lo + row, ys_lo, (order - 1) * row * sizeof(double));
        std::memcpy(ys_hi, ynew_hi.data(), row * sizeof(double));
        std::memcpy(ys_lo, ynew_lo.data(), row * sizeof(double));
    }
    *t_io = t;
}

}  // extern "C"
