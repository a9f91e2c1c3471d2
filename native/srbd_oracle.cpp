// srbd_oracle: independent double-precision CPU implementation of the SRBD
// NMPC algorithm, used as a golden oracle for the TPU solver's parity tests.
//
// Implements the same mathematics as the JAX engine (and the reference
// C++/Eigen stack it models — see /root/reference/dynamics/SRBD_model.cpp,
// NMPC_solver.cpp, cited per-function below), but written independently on
// plain C arrays: no Eigen, different loop structure, classical Cholesky
// instead of HPIPM. Exposed through a C ABI for ctypes.
//
// Build: cmake -S native -B native/build && cmake --build native/build
// Output: libsrbd_oracle.so

#include <cmath>
#include <cstring>
#include <vector>

namespace {

constexpr int NX = 12;
constexpr int NU = 12;
constexpr int NG = 24;

using Vec3 = double[3];
using Mat3 = double[9];  // row-major

inline double clamp_theta(double t) { return t < 1e-10 ? 1e-10 : t; }

inline void mat3_mul(const double* a, const double* b, double* c) {
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += a[3 * i + k] * b[3 * k + j];
      c[3 * i + j] = s;
    }
}

inline void mat3_vec(const double* a, const double* v, double* y) {
  for (int i = 0; i < 3; ++i)
    y[i] = a[3 * i] * v[0] + a[3 * i + 1] * v[1] + a[3 * i + 2] * v[2];
}

inline void skew(const double* v, double* m) {
  m[0] = 0;     m[1] = -v[2]; m[2] = v[1];
  m[3] = v[2];  m[4] = 0;     m[5] = -v[0];
  m[6] = -v[1]; m[7] = v[0];  m[8] = 0;
}

inline void eye3(double* m) {
  std::memset(m, 0, 9 * sizeof(double));
  m[0] = m[4] = m[8] = 1.0;
}

// Rodrigues (orientation_tool.h:76-86)
void so3_expm(const double* r, double* R) {
  double t = clamp_theta(std::sqrt(r[0] * r[0] + r[1] * r[1] + r[2] * r[2]));
  double W[9], WW[9];
  skew(r, W);
  mat3_mul(W, W, WW);
  double a = std::sin(t) / t, b = (1.0 - std::cos(t)) / (t * t);
  eye3(R);
  for (int i = 0; i < 9; ++i) R[i] += a * W[i] + b * WW[i];
}

// left Jacobian (orientation_tool.h:129-140)
void so3_jl(const double* r, double* J) {
  double t = clamp_theta(std::sqrt(r[0] * r[0] + r[1] * r[1] + r[2] * r[2]));
  double W[9], VV[9];
  skew(r, W);
  for (int i = 0; i < 9; ++i) W[i] /= t;
  mat3_mul(W, W, VV);
  double s = std::sin(t) / t, c = (1.0 - std::cos(t)) / t;
  eye3(J);
  for (int i = 0; i < 9; ++i) {
    double I = (i % 4 == 0) ? 1.0 : 0.0;
    J[i] = s * I + (1.0 - s) * (VV[i] + I) + c * W[i];
  }
}

// inverse left Jacobian (orientation_tool.h:145-157)
void so3_jlt(const double* r, double* J) {
  double t = clamp_theta(std::sqrt(r[0] * r[0] + r[1] * r[1] + r[2] * r[2]));
  double W[9], VV[9];
  skew(r, W);
  for (int i = 0; i < 9; ++i) W[i] /= t;
  mat3_mul(W, W, VV);
  double hc = 0.5 * t / std::tan(0.5 * t);
  for (int i = 0; i < 9; ++i) {
    double I = (i % 4 == 0) ? 1.0 : 0.0;
    J[i] = hc * I + (1.0 - hc) * (VV[i] + I) - 0.5 * t * W[i];
  }
}

// d(jl)/dr_a (orientation_tool.h:165-204)
void so3_djl(const double* r, double out[3][9]) {
  double t = clamp_theta(std::sqrt(r[0] * r[0] + r[1] * r[1] + r[2] * r[2]));
  double W[9], V[9], VV[9];
  skew(r, W);
  for (int i = 0; i < 9; ++i) V[i] = W[i] / t;
  mat3_mul(V, V, VV);
  double st = std::sin(t), ct = std::cos(t);
  double t2 = t * t, t3 = t2 * t;
  double base[9];
  double cb1 = (t * st + 2.0 * (ct - 1.0)) / t3;
  double cb2 = -(2.0 * t - 3.0 * st + t * ct) / t3;
  for (int i = 0; i < 9; ++i) base[i] = cb1 * V[i] + cb2 * VV[i];
  double c1 = (t - st) / t3, c2 = (1.0 - ct) / t2;
  for (int a = 0; a < 3; ++a) {
    double e[3] = {0, 0, 0};
    e[a] = 1.0;
    double E[9], EW[9], WE[9];
    skew(e, E);
    mat3_mul(E, W, EW);
    mat3_mul(W, E, WE);
    for (int i = 0; i < 9; ++i)
      out[a][i] = c1 * (EW[i] + WE[i]) + c2 * E[i] + r[a] * base[i];
  }
}

// d(jl^-1)/dr_a = -Jlt djl_a Jlt (orientation_tool.h:212-227)
void so3_djlt(const double* r, double out[3][9]) {
  double Jlt[9], djl[3][9], tmp[9];
  so3_jlt(r, Jlt);
  so3_djl(r, djl);
  for (int a = 0; a < 3; ++a) {
    mat3_mul(djl[a], Jlt, tmp);
    mat3_mul(Jlt, tmp, out[a]);
    for (int i = 0; i < 9; ++i) out[a][i] = -out[a][i];
  }
}

struct Model {
  double mass;
  double dt;
  double inertia_inv[9];
  double foot[2][3];
  double mu_b, theta_b;  // barrier params
  double mu_f = 0.5, lfx = 0.05, lfz = 0.05, fmax = 1000.0, fmin = 0.0;
};

// continuous SRBD ODE (SRBD_model.cpp:75-99)
void dynamics(const Model& m, const double* x, const double* u, double* dx) {
  const double* r = x;
  const double* l = x + 3;
  const double* p = x + 6;
  const double* v = x + 9;
  double R[9], Rt[9], tmp[9], RIRt[9], Jlt[9];
  so3_expm(r, R);
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) Rt[3 * i + j] = R[3 * j + i];
  mat3_mul(m.inertia_inv, Rt, tmp);
  mat3_mul(R, tmp, RIRt);
  double w[3];
  mat3_vec(RIRt, l, w);
  so3_jlt(r, Jlt);
  mat3_vec(Jlt, w, dx);  // r_dot
  double lever0[3] = {m.foot[0][0] - p[0], m.foot[0][1] - p[1], m.foot[0][2] - p[2]};
  double lever1[3] = {m.foot[1][0] - p[0], m.foot[1][1] - p[1], m.foot[1][2] - p[2]};
  // l_dot = tau_r + tau_l + lever0 x F_r + lever1 x F_l
  dx[3] = u[3] + u[9] + (lever0[1] * u[2] - lever0[2] * u[1]) + (lever1[1] * u[8] - lever1[2] * u[7]);
  dx[4] = u[4] + u[10] + (lever0[2] * u[0] - lever0[0] * u[2]) + (lever1[2] * u[6] - lever1[0] * u[8]);
  dx[5] = u[5] + u[11] + (lever0[0] * u[1] - lever0[1] * u[0]) + (lever1[0] * u[7] - lever1[1] * u[6]);
  dx[6] = v[0]; dx[7] = v[1]; dx[8] = v[2];
  dx[9] = (u[0] + u[6]) / m.mass;
  dx[10] = (u[1] + u[7]) / m.mass;
  dx[11] = (u[2] + u[8]) / m.mass - 9.8;
}

// continuous jacobians (SRBD_model.cpp:105-140)
void jacobians(const Model& m, const double* x, const double* u,
               double Jx[NX * NX], double Ju[NX * NU]) {
  const double* r = x;
  const double* l = x + 3;
  const double* p = x + 6;
  double R[9], Rt[9], tmp[9], RIRt[9], Jlt[9], Jl[9];
  so3_expm(r, R);
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) Rt[3 * i + j] = R[3 * j + i];
  mat3_mul(m.inertia_inv, Rt, tmp);
  mat3_mul(R, tmp, RIRt);
  double w[3];
  mat3_vec(RIRt, l, w);
  so3_jlt(r, Jlt);
  so3_jl(r, Jl);
  double djlt[3][9];
  so3_djlt(r, djlt);
  double djlt_w[9];  // column a = djlt[a] @ w
  for (int a = 0; a < 3; ++a) {
    double col[3];
    mat3_vec(djlt[a], w, col);
    for (int i = 0; i < 3; ++i) djlt_w[3 * i + a] = col[i];
  }
  double skl[9], skw[9], inner[9], t2[9], D1[9], D2[9];
  skew(l, skl);
  skew(w, skw);
  mat3_mul(RIRt, skl, inner);
  for (int i = 0; i < 9; ++i) inner[i] -= skw[i];
  mat3_mul(inner, Jl, t2);
  mat3_mul(Jlt, t2, D1);
  for (int i = 0; i < 9; ++i) D1[i] += djlt_w[i];
  mat3_mul(Jlt, RIRt, D2);

  std::memset(Jx, 0, NX * NX * sizeof(double));
  std::memset(Ju, 0, NX * NU * sizeof(double));
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      Jx[NX * i + j] = D1[3 * i + j];
      Jx[NX * i + (j + 3)] = D2[3 * i + j];
    }
  double fsum[3] = {u[0] + u[6], u[1] + u[7], u[2] + u[8]};
  double sf[9];
  skew(fsum, sf);
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) Jx[NX * (i + 3) + (j + 6)] = sf[3 * i + j];
  for (int i = 0; i < 3; ++i) Jx[NX * (i + 6) + (i + 9)] = 1.0;

  double lever0[3] = {m.foot[0][0] - p[0], m.foot[0][1] - p[1], m.foot[0][2] - p[2]};
  double lever1[3] = {m.foot[1][0] - p[0], m.foot[1][1] - p[1], m.foot[1][2] - p[2]};
  double s0[9], s1[9];
  skew(lever0, s0);
  skew(lever1, s1);
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      Ju[NU * (i + 3) + j] = s0[3 * i + j];
      Ju[NU * (i + 3) + (j + 6)] = s1[3 * i + j];
    }
  for (int i = 0; i < 3; ++i) {
    Ju[NU * (i + 3) + (i + 3)] = 1.0;
    Ju[NU * (i + 3) + (i + 9)] = 1.0;
    Ju[NU * (i + 9) + i] = 1.0 / m.mass;
    Ju[NU * (i + 9) + (i + 6)] = 1.0 / m.mass;
  }
}

void rk4(const Model& m, const double* x, const double* u, double* out) {
  double k1[NX], k2[NX], k3[NX], k4[NX], xt[NX];
  dynamics(m, x, u, k1);
  for (int i = 0; i < NX; ++i) xt[i] = x[i] + 0.5 * m.dt * k1[i];
  dynamics(m, xt, u, k2);
  for (int i = 0; i < NX; ++i) xt[i] = x[i] + 0.5 * m.dt * k2[i];
  dynamics(m, xt, u, k3);
  for (int i = 0; i < NX; ++i) xt[i] = x[i] + m.dt * k3[i];
  dynamics(m, xt, u, k4);
  for (int i = 0; i < NX; ++i)
    out[i] = x[i] + (m.dt / 6.0) * (k1[i] + 2 * k2[i] + 2 * k3[i] + k4[i]);
}

// friction-cone rows (SRBD_model.cpp:237-260): con = Ac u + bc
void constraint_rows(const Model& m, double Ac[NG * NU], double bc[NG]) {
  std::memset(Ac, 0, NG * NU * sizeof(double));
  std::memset(bc, 0, NG * sizeof(double));
  for (int leg = 0; leg < 2; ++leg) {
    int r0 = 12 * leg, c0 = 6 * leg;
    auto row = [&](int i) { return Ac + NU * (r0 + i) + c0; };
    row(0)[0] = -1; row(0)[2] = m.mu_f;
    row(1)[1] = -1; row(1)[2] = m.mu_f;
    row(2)[0] = 1;  row(2)[2] = m.mu_f;
    row(3)[1] = 1;  row(3)[2] = m.mu_f;
    row(4)[2] = -1;
    row(5)[2] = 1;
    // foot rotation = identity (benchmark setup): rx=e0, ry=e1, rz=e2
    row(6)[2] = m.lfx;  row(6)[3 + 1] = -1;
    row(7)[2] = m.lfx;  row(7)[3 + 1] = 1;
    row(8)[2] = m.lfz;  row(8)[3 + 2] = -1;
    row(9)[2] = m.lfz;  row(9)[3 + 2] = 1;
    row(10)[3 + 0] = -1;
    row(11)[3 + 0] = 1;
    bc[r0 + 4] = m.fmax;
    bc[r0 + 5] = -m.fmin;
  }
}

// relaxed log barrier (SRBD_model.cpp:262-295)
void barrier(double v, double mu, double th, double* b, double* db, double* ddb) {
  if (v > th) {
    *b = -mu * std::log(v);
    *db = -mu / v;
    *ddb = mu / (v * v);
  } else {
    double z = (v - 2.0 * th) / th;
    *b = 0.5 * mu * (z * z - 1.0) - mu * std::log(th);
    *db = mu * (v - 2.0 * th) / (th * th);
    *ddb = mu / (th * th);
  }
}

// dense Cholesky solve, n x n SPD, rhs n x m (row-major)
bool chol_solve(int n, int m, double* G, double* rhs) {
  std::vector<double> L(n * n, 0.0);
  for (int j = 0; j < n; ++j) {
    double s = G[n * j + j];
    for (int k = 0; k < j; ++k) s -= L[n * j + k] * L[n * j + k];
    if (s <= 0) return false;
    double d = std::sqrt(s);
    L[n * j + j] = d;
    for (int i = j + 1; i < n; ++i) {
      double t = G[n * i + j];
      for (int k = 0; k < j; ++k) t -= L[n * i + k] * L[n * j + k];
      L[n * i + j] = t / d;
    }
  }
  for (int c = 0; c < m; ++c) {
    for (int i = 0; i < n; ++i) {
      double t = rhs[m * i + c];
      for (int k = 0; k < i; ++k) t -= L[n * i + k] * rhs[m * k + c];
      rhs[m * i + c] = t / L[n * i + i];
    }
    for (int i = n - 1; i >= 0; --i) {
      double t = rhs[m * i + c];
      for (int k = i + 1; k < n; ++k) t -= L[n * k + i] * rhs[m * k + c];
      rhs[m * i + c] = t / L[n * i + i];
    }
  }
  return true;
}

struct Work {
  int N;
  std::vector<double> A, B, b;       // [N][12x12], [N][12x12], [N][12]
  std::vector<double> Qd, qv, Rm, rv;  // per-stage cost
  std::vector<double> x, u, dx, du;
};

}  // namespace

extern "C" {

// Solve the benchmark NMPC problem. Returns 1 if converged, 0 otherwise.
// params: [mass, dt, Ixx, Iyy, Izz, foot_r(3), foot_l(3), mu_b, theta_b]
// weights: [Qdiag(12), R_scalar, Qfdiag(12)]
// x0: [12]; x_ref: [12] (constant across horizon)
// outputs: x_out [(N+1)*12], u_out [N*12], info [5]: iters, theta, phi,
//          dphi, alpha.
int srbd_nmpc_solve(const double* params, const double* weights, int N,
                    int sqp_max_iter, const double* x0, const double* x_ref,
                    double* x_out, double* u_out, double* info) {
  Model m;
  m.mass = params[0];
  m.dt = params[1];
  std::memset(m.inertia_inv, 0, sizeof(m.inertia_inv));
  m.inertia_inv[0] = 1.0 / params[2];
  m.inertia_inv[4] = 1.0 / params[3];
  m.inertia_inv[8] = 1.0 / params[4];
  for (int i = 0; i < 3; ++i) {
    m.foot[0][i] = params[5 + i];
    m.foot[1][i] = params[8 + i];
  }
  m.mu_b = params[11];
  m.theta_b = params[12];

  const double* Qdiag = weights;
  double Rs = weights[12];
  const double* Qfd = weights + 13;
  std::vector<double> Qfdiag(12);
  for (int i = 0; i < 12; ++i) Qfdiag[i] = N * Qfd[i];  // Qf = N*diag (NMPC_solver.cpp:58)

  double Ac[NG * NU], bc[NG];
  constraint_rows(m, Ac, bc);

  // state: x = 0, u = 100 (NMPC_solver.cpp:60-64)
  std::vector<double> x((N + 1) * NX, 0.0), u(N * NU, 100.0);
  double alpha = 1.0;  // persistent (NMPC_solver.h:104)

  auto merit = [&](const std::vector<double>& xs, const std::vector<double>& us,
                   double* theta, double* phi) {
    *theta = 0.0;
    *phi = 0.0;
    for (int k = 0; k < N; ++k) {
      double pred[NX];
      rk4(m, &xs[k * NX], &us[k * NU], pred);
      for (int i = 0; i < NX; ++i) {
        double f = xs[(k + 1) * NX + i] - pred[i];
        *theta += 0.5 * f * f;
      }
      for (int i = 0; i < NX; ++i) {
        double e = xs[k * NX + i] - x_ref[i];
        *phi += 0.5 * Qdiag[i] * e * e;
      }
      for (int g = 0; g < NG; ++g) {
        double v = bc[g];
        for (int j = 0; j < NU; ++j) v += Ac[NU * g + j] * us[k * NU + j];
        double bb, db, ddb;
        barrier(v, m.mu_b, m.theta_b, &bb, &db, &ddb);
        *phi += bb;
      }
      for (int j = 0; j < NU; ++j)
        *phi += 0.5 * Rs * us[k * NU + j] * us[k * NU + j];
    }
    for (int i = 0; i < NX; ++i) {
      double e = xs[N * NX + i] - x_ref[i];
      *phi += 0.5 * Qfdiag[i] * e * e;
    }
  };

  double theta0 = 0, phi0 = 0, dphi = 0;
  int it = 0;
  bool converged = false;

  std::vector<double> A(N * NX * NX), B(N * NX * NU), bvec(N * NX);
  std::vector<double> Reff(N * NU * NU), reff(N * NU), qvec((N + 1) * NX);
  std::vector<double> P((N + 1) * NX * NX), pvec((N + 1) * NX);
  std::vector<double> K(N * NU * NX), kff(N * NU);
  std::vector<double> dxs((N + 1) * NX), dus(N * NU);

  for (it = 0; it < sqp_max_iter; ++it) {
    // ---- linearize (prepareQpStructures, NMPC_solver.cpp:276-314) ----
    for (int k = 0; k < N; ++k) {
      double Jx[NX * NX], Ju[NX * NU], pred[NX];
      jacobians(m, &x[k * NX], &u[k * NU], Jx, Ju);
      for (int i = 0; i < NX * NX; ++i) A[k * NX * NX + i] = m.dt * Jx[i];
      for (int i = 0; i < NX; ++i) A[k * NX * NX + NX * i + i] += 1.0;
      for (int i = 0; i < NX * NU; ++i) B[k * NX * NU + i] = m.dt * Ju[i];
      rk4(m, &x[k * NX], &u[k * NU], pred);
      for (int i = 0; i < NX; ++i)
        bvec[k * NX + i] = pred[i] - x[(k + 1) * NX + i];  // b = -f

      // barrier-augmented input cost
      double db[NG], ddb[NG];
      for (int g = 0; g < NG; ++g) {
        double v = bc[g];
        for (int j = 0; j < NU; ++j) v += Ac[NU * g + j] * u[k * NU + j];
        double bb;
        barrier(v, m.mu_b, m.theta_b, &bb, &db[g], &ddb[g]);
      }
      for (int i = 0; i < NU; ++i) {
        for (int j = 0; j < NU; ++j) {
          double s = (i == j) ? Rs : 0.0;
          for (int g = 0; g < NG; ++g)
            s += Ac[NU * g + i] * ddb[g] * Ac[NU * g + j];
          Reff[k * NU * NU + NU * i + j] = s;
        }
        double s = Rs * u[k * NU + i];
        for (int g = 0; g < NG; ++g) s += Ac[NU * g + i] * db[g];
        reff[k * NU + i] = s;
      }
      for (int i = 0; i < NX; ++i)
        qvec[k * NX + i] = Qdiag[i] * (x[k * NX + i] - x_ref[i]);
    }
    for (int i = 0; i < NX; ++i)
      qvec[N * NX + i] = Qfdiag[i] * (x[N * NX + i] - x_ref[i]);

    // ---- Riccati backward (oracle recursion, cf. hpipm-cpp test :61-91) --
    for (int i = 0; i < NX; ++i) {
      for (int j = 0; j < NX; ++j)
        P[N * NX * NX + NX * i + j] = (i == j) ? Qfdiag[i] : 0.0;
      pvec[N * NX + i] = qvec[N * NX + i];
    }
    for (int k = N - 1; k >= 0; --k) {
      const double* Ak = &A[k * NX * NX];
      const double* Bk = &B[k * NX * NU];
      const double* Pn = &P[(k + 1) * NX * NX];
      const double* pn = &pvec[(k + 1) * NX];
      double PA[NX * NX], PB[NX * NU], Pb_p[NX];
      for (int i = 0; i < NX; ++i) {
        for (int j = 0; j < NX; ++j) {
          double s = 0;
          for (int l2 = 0; l2 < NX; ++l2) s += Pn[NX * i + l2] * Ak[NX * l2 + j];
          PA[NX * i + j] = s;
        }
        for (int j = 0; j < NU; ++j) {
          double s = 0;
          for (int l2 = 0; l2 < NX; ++l2) s += Pn[NX * i + l2] * Bk[NU * l2 + j];
          PB[NX * i + j] = s;
        }
        double s = pn[i];
        for (int l2 = 0; l2 < NX; ++l2) s += Pn[NX * i + l2] * bvec[k * NX + l2];
        Pb_p[i] = s;
      }
      double G[NU * NU], H[NU * NX], rhs[NU * (NX + 1)];
      for (int i = 0; i < NU; ++i) {
        for (int j = 0; j < NU; ++j) {
          double s = Reff[k * NU * NU + NU * i + j];
          for (int l2 = 0; l2 < NX; ++l2) s += Bk[NU * l2 + i] * PB[NU * l2 + j];
          G[NU * i + j] = s;
        }
        for (int j = 0; j < NX; ++j) {
          double s = 0;  // S = 0
          for (int l2 = 0; l2 < NX; ++l2) s += Bk[NU * l2 + i] * PA[NX * l2 + j];
          H[NX * i + j] = s;
        }
      }
      for (int i = 0; i < NU; ++i) {
        for (int j = 0; j < NX; ++j) rhs[(NX + 1) * i + j] = H[NX * i + j];
        double s = reff[k * NU + i];
        for (int l2 = 0; l2 < NX; ++l2) s += Bk[NU * l2 + i] * Pb_p[l2];
        rhs[(NX + 1) * i + NX] = s;
      }
      if (!chol_solve(NU, NX + 1, G, rhs)) return -1;
      for (int i = 0; i < NU; ++i) {
        for (int j = 0; j < NX; ++j) K[k * NU * NX + NX * i + j] = -rhs[(NX + 1) * i + j];
        kff[k * NU + i] = -rhs[(NX + 1) * i + NX];
      }
      // P_k = Q + A'PA + H'K ; p_k = q + A'(Pb+p') + H'k
      for (int i = 0; i < NX; ++i) {
        for (int j = 0; j < NX; ++j) {
          double s = (i == j) ? Qdiag[i] : 0.0;
          for (int l2 = 0; l2 < NX; ++l2) {
            s += Ak[NX * l2 + i] * PA[NX * l2 + j];
            if (l2 < NU) s += H[NX * l2 + i] * K[k * NU * NX + NX * l2 + j];
          }
          P[k * NX * NX + NX * i + j] = s;
        }
        double s = qvec[k * NX + i];
        for (int l2 = 0; l2 < NX; ++l2) s += Ak[NX * l2 + i] * Pb_p[l2];
        for (int l2 = 0; l2 < NU; ++l2) s += H[NX * l2 + i] * kff[k * NU + l2];
        pvec[k * NX + i] = s;
      }
      // symmetrize
      for (int i = 0; i < NX; ++i)
        for (int j = i + 1; j < NX; ++j) {
          double avg = 0.5 * (P[k * NX * NX + NX * i + j] + P[k * NX * NX + NX * j + i]);
          P[k * NX * NX + NX * i + j] = avg;
          P[k * NX * NX + NX * j + i] = avg;
        }
    }
    // forward rollout (delta form: dx0 = x0 - x[0])
    for (int i = 0; i < NX; ++i) dxs[i] = x0[i] - x[i];
    for (int k = 0; k < N; ++k) {
      const double* Ak = &A[k * NX * NX];
      const double* Bk = &B[k * NX * NU];
      for (int i = 0; i < NU; ++i) {
        double s = kff[k * NU + i];
        for (int j = 0; j < NX; ++j) s += K[k * NU * NX + NX * i + j] * dxs[k * NX + j];
        dus[k * NU + i] = s;
      }
      for (int i = 0; i < NX; ++i) {
        double s = bvec[k * NX + i];
        for (int j = 0; j < NX; ++j) s += Ak[NX * i + j] * dxs[k * NX + j];
        for (int j = 0; j < NU; ++j) s += Bk[NU * i + j] * dus[k * NU + j];
        dxs[(k + 1) * NX + i] = s;
      }
    }

    // ---- merit + gradients at current point (linearSearch :152-198) ----
    merit(x, u, &theta0, &phi0);
    dphi = 0.0;
    for (int k = 0; k <= N; ++k) {
      for (int i = 0; i < NX; ++i) {
        double e = x[k * NX + i] - x_ref[i];
        double gx = (k == N) ? Qfdiag[i] * e : Qdiag[i] * e;
        dphi += dxs[k * NX + i] * gx;
      }
      if (k < N) {
        double db[NG], ddb[NG];
        for (int g = 0; g < NG; ++g) {
          double v = bc[g];
          for (int j = 0; j < NU; ++j) v += Ac[NU * g + j] * u[k * NU + j];
          double bb;
          barrier(v, m.mu_b, m.theta_b, &bb, &db[g], &ddb[g]);
        }
        for (int i = 0; i < NU; ++i) {
          double gu = Rs * u[k * NU + i];
          for (int g = 0; g < NG; ++g) gu += Ac[NU * g + i] * db[g];
          dphi += dus[k * NU + i] * gu;
        }
      }
    }

    // ---- filter line search (NMPC_solver.cpp:200-264) ----
    const double theta_max = 1e-6, theta_min = 5e-10, eta = 1e-4;
    const double byta_phi = 1e-6, byta_theta = 1e-6, byta_alpha = 0.5;
    const double alpha_min = 1e-4;
    std::vector<double> xa((N + 1) * NX), ua(N * NU);
    while (alpha > alpha_min) {
      for (size_t i = 0; i < xa.size(); ++i) xa[i] = x[i] + alpha * dxs[i];
      for (size_t i = 0; i < ua.size(); ++i) ua[i] = u[i] + alpha * dus[i];
      double theta_a, phi_a;
      merit(xa, ua, &theta_a, &phi_a);
      bool accept;
      if (theta_a > theta_max) {
        accept = theta_a < (1.0 - byta_theta) * theta0;
      } else if (std::max(theta_a, theta0) < theta_min && dphi < 0.0) {
        accept = phi_a < phi0 + eta * alpha * dphi;
      } else {
        accept = (phi_a < phi0 - byta_phi * theta0) ||
                 (theta_a < (1.0 - byta_theta) * theta0);
      }
      if (accept) {
        x = xa;
        u = ua;
        break;
      }
      alpha *= byta_alpha;
    }

    if (dphi > -1e-3 && theta0 < 1e-6) {  // NMPC_solver.cpp:267
      converged = true;
      ++it;
      break;
    }
  }

  std::memcpy(x_out, x.data(), (N + 1) * NX * sizeof(double));
  std::memcpy(u_out, u.data(), N * NU * sizeof(double));
  if (info) {
    info[0] = it;
    info[1] = theta0;
    info[2] = phi0;
    info[3] = dphi;
    info[4] = alpha;
  }
  return converged ? 1 : 0;
}

}  // extern "C"
