// Native (C++/OpenMP) tripolar grid generation kernels.
//
// The reference generates grids host-side in Julia and notes it "might become slow for
// sub-kilometer resolution grids" (src/tripolar_grid.jl:68-71). This module provides
// the two hot per-point loops of grids/tripolar.build_tripolar_arrays as parallel C++:
//
//   1. murray_coords:   the Murray (1996) closed-form mapping at one staggered
//                       location (port of _compute_tripolar_coordinates!,
//                       src/generate_tripolar_coordinates.jl:53-89)
//   2. metric_arcs:     haversine arc lengths + spherical quadrilateral areas
//                       (port of _calculate_metrics!, src/tripolar_grid_utils.jl:4-45)
//
// Semantics match grids/tripolar.py bit-for-bit where it matters: degree-exact
// trigonometry with Julia's signed-zero convention at multiples of 180 degrees (the
// sign of the zero decides the atan(y/x) branch on the +-180 meridian).
//
// Build: cc -O3 -march=native -fopenmp -shared -fPIC tripolar_gen.cpp -o libtripolar_gen.so
// (orthogonalsphericalshellgrids_tpu/grids/native.py drives the build and falls back
// to the numpy path when no compiler is available).

#include <cmath>
#include <cstdint>

namespace {

constexpr double DEG = M_PI / 180.0;

// Julia-compatible sind: exact signed zeros at multiples of 180, exact +-1 at 90/270.
inline double sind(double x) {
    double r = std::fmod(x, 360.0);
    if (r < 0) r += 360.0;
    if (std::fmod(r, 180.0) == 0.0) return std::copysign(0.0, x);
    if (r == 90.0) return 1.0;
    if (r == 270.0) return -1.0;
    return std::sin(r * DEG);
}

inline double cosd(double x) { return sind(x + 90.0); }
inline double tand(double x) { return sind(x) / cosd(x); }

inline double wrap360(double x) {
    double r = std::fmod(x, 360.0);
    r = std::fmod(r + 360.0, 360.0);
    return r;
}

}  // namespace

extern "C" {

// lam1d: (nx,), phi1d: (ny,); outputs lam2/phi2: (ny, nx) row-major [j, i].
void murray_coords(const double* lam1d, const double* phi1d,
                   int64_t nx, int64_t ny,
                   double focal_distance, double first_pole_longitude,
                   double* lam2, double* phi2) {
    const double a = focal_distance;
#pragma omp parallel for schedule(static)
    for (int64_t j = 0; j < ny; ++j) {
        const double psi = std::asinh(tand((90.0 - phi1d[j]) / 2.0) / a);
        const double ch = std::cosh(psi), sh = std::sinh(psi);
        for (int64_t i = 0; i < nx; ++i) {
            const double x = a * sind(lam1d[i]) * ch;
            const double y = a * cosd(lam1d[i]) * sh;
            double lam;
            if (x == 0.0 && y == 0.0) {
                // north-pole special case (i==1 Julia); expressed on the longitude
                // value (i==0 <=> lam==-180 for the canonical [-180,180) input) so a
                // circshifted 1-D input yields the circshifted output directly
                lam = (lam1d[i] == -180.0) ? -90.0 : 90.0;
            } else {
                lam = -(180.0 / M_PI) * std::atan(y / x);
            }
            const double phi = 90.0 - (360.0 / M_PI) * std::atan(std::sqrt(x * x + y * y));
            lam += (lam1d[i] < 0.0) ? -90.0 : 90.0;  // hemisphere shift (i < nx/2)
            lam += first_pole_longitude + 90.0;
            lam2[j * nx + i] = wrap360(lam);
            phi2[j * nx + i] = phi;
        }
    }
}

// Haversine between (lon1, lat1) and (lon2, lat2) in degrees, radius r.
static inline double haversine(double lon1, double lat1, double lon2, double lat2,
                               double r) {
    const double dlat = (lat2 - lat1) * DEG, dlon = (lon2 - lon1) * DEG;
    const double s1 = std::sin(dlat / 2), s2 = std::sin(dlon / 2);
    double h = s1 * s1 + std::cos(lat1 * DEG) * std::cos(lat2 * DEG) * s2 * s2;
    if (h < 0) h = 0;
    if (h > 1) h = 1;
    return 2.0 * r * std::asin(std::sqrt(h));
}

static inline void cart(double lat, double lon, double* v) {
    const double cl = std::cos(lat * DEG);
    v[0] = cl * std::cos(lon * DEG);
    v[1] = cl * std::sin(lon * DEG);
    v[2] = std::sin(lat * DEG);
}

static inline double tri_area(const double* A, const double* B, const double* C) {
    const double bxc0 = B[1] * C[2] - B[2] * C[1];
    const double bxc1 = B[2] * C[0] - B[0] * C[2];
    const double bxc2 = B[0] * C[1] - B[1] * C[0];
    const double num = std::fabs(A[0] * bxc0 + A[1] * bxc1 + A[2] * bxc2);
    const double den = 1.0 + (A[0] * B[0] + A[1] * B[1] + A[2] * B[2])
                           + (B[0] * C[0] + B[1] * C[1] + B[2] * C[2])
                           + (A[0] * C[0] + A[1] * C[1] + A[2] * C[2]);
    return 2.0 * std::atan2(num, den);
}

// All coordinate inputs are HALO-INCLUSIVE (rows = nyh, cols = nxh) row-major; metric
// outputs are interior (ny, nx). (hx, hy) are the halo offsets. Mirrors the slice
// arithmetic of grids/tripolar.build_tripolar_arrays.
void metric_arcs(const double* lam_ff, const double* phi_ff,
                 const double* lam_fc, const double* phi_fc,
                 const double* lam_cf, const double* phi_cf,
                 const double* lam_cc, const double* phi_cc,
                 int64_t nx, int64_t ny, int64_t nxh, int64_t hx, int64_t hy,
                 double radius,
                 double* dx_cc, double* dx_fc, double* dx_cf, double* dx_ff,
                 double* dy_cc, double* dy_fc, double* dy_cf, double* dy_ff,
                 double* az_cc, double* az_fc, double* az_cf, double* az_ff) {
#define AT(A, J, I) A[(J + hy) * nxh + (I + hx)]
#pragma omp parallel for schedule(static)
    for (int64_t j = 0; j < ny; ++j) {
        for (int64_t i = 0; i < nx; ++i) {
            const int64_t o = j * nx + i;
            dx_cc[o] = haversine(AT(lam_fc, j, i + 1), AT(phi_fc, j, i + 1),
                                 AT(lam_fc, j, i), AT(phi_fc, j, i), radius);
            dx_fc[o] = haversine(AT(lam_cc, j, i), AT(phi_cc, j, i),
                                 AT(lam_cc, j, i - 1), AT(phi_cc, j, i - 1), radius);
            dx_cf[o] = haversine(AT(lam_ff, j, i + 1), AT(phi_ff, j, i + 1),
                                 AT(lam_ff, j, i), AT(phi_ff, j, i), radius);
            dx_ff[o] = haversine(AT(lam_cf, j, i), AT(phi_cf, j, i),
                                 AT(lam_cf, j, i - 1), AT(phi_cf, j, i - 1), radius);

            dy_cc[o] = haversine(AT(lam_cf, j + 1, i), AT(phi_cf, j + 1, i),
                                 AT(lam_cf, j, i), AT(phi_cf, j, i), radius);
            dy_fc[o] = haversine(AT(lam_ff, j + 1, i), AT(phi_ff, j + 1, i),
                                 AT(lam_ff, j, i), AT(phi_ff, j, i), radius);
            dy_cf[o] = haversine(AT(lam_cc, j, i), AT(phi_cc, j, i),
                                 AT(lam_cc, j - 1, i), AT(phi_cc, j - 1, i), radius);
            dy_ff[o] = haversine(AT(lam_fc, j, i), AT(phi_fc, j, i),
                                 AT(lam_fc, j - 1, i), AT(phi_fc, j - 1, i), radius);

            double A[3], B[3], C[3], D[3];
            cart(AT(phi_ff, j, i), AT(lam_ff, j, i), A);
            cart(AT(phi_ff, j, i + 1), AT(lam_ff, j, i + 1), B);
            cart(AT(phi_ff, j + 1, i + 1), AT(lam_ff, j + 1, i + 1), C);
            cart(AT(phi_ff, j + 1, i), AT(lam_ff, j + 1, i), D);
            az_cc[o] = (tri_area(A, B, C) + tri_area(A, C, D)) * radius * radius;

            az_fc[o] = dy_fc[o] * dx_fc[o];
            az_cf[o] = dy_cf[o] * dx_cf[o];

            cart(AT(phi_cc, j - 1, i - 1), AT(lam_cc, j - 1, i - 1), A);
            cart(AT(phi_cc, j - 1, i), AT(lam_cc, j - 1, i), B);
            cart(AT(phi_cc, j, i), AT(lam_cc, j, i), C);
            cart(AT(phi_cc, j, i - 1), AT(lam_cc, j, i - 1), D);
            az_ff[o] = (tri_area(A, B, C) + tri_area(A, C, D)) * radius * radius;
        }
    }
#undef AT
}

}  // extern "C"
