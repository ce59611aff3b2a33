// Native cell-list pair counters for the host-side tabulation path.
//
// Role: the CPU production equivalent of the Corrfunc kernels the reference
// wraps (reference: tabcorr/corrfunc.py) — periodic-box pair counts in
// (rp, pi), (s, mu) and projected-rp geometries, generalized to carry an
// integer bin label per tracer so one sweep fills the whole
// counts[label1, label2, r] tensor (the same labeled-histogram design as
// the device kernels in tabcorr_tpu/ops/paircount.py).
//
// Conventions match the device kernels: ordered pairs (each unordered pair
// counted twice in auto mode), self-pairs excluded, minimum-image periodic
// separations. Exposed through ctypes (see tabcorr_tpu/native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct CellList {
    // Cell-list over one tracer set: cells of size >= the search radius in
    // each periodic dimension, point data stored contiguously per cell.
    int nc[3];
    double cell_size[3];
    double period[3];
    std::vector<int64_t> cell_start;  // size ncells+1
    std::vector<double> px, py, pz;   // reordered positions
    std::vector<int32_t> label;       // reordered labels
    std::vector<int64_t> orig;        // original indices (self-exclusion)
    std::vector<double> weight;       // reordered weights

    int64_t ncells() const {
        return int64_t(nc[0]) * nc[1] * nc[2];
    }

    int cell_coord(double x, int d) const {
        int c = int(std::floor(x / cell_size[d]));
        if (c >= nc[d]) c = nc[d] - 1;
        if (c < 0) c = 0;
        return c;
    }

    int64_t cell_index(int cx, int cy, int cz) const {
        return (int64_t(cx) * nc[1] + cy) * nc[2] + cz;
    }

    void build(const double* pos, const int32_t* labels,
               const double* weights, int64_t n, const double* box,
               const double* rmax) {
        for (int d = 0; d < 3; d++) {
            period[d] = box[d];
            // At least one cell; cells no smaller than the search radius
            // so +-1 neighbor cells cover every candidate pair.
            int c = rmax[d] > 0 ? int(std::floor(box[d] / rmax[d])) : 1;
            nc[d] = std::max(1, std::min(c, 256));
            cell_size[d] = box[d] / nc[d];
        }
        int64_t m = ncells();
        std::vector<int64_t> count(m, 0);
        std::vector<int64_t> cell_of(n);
        for (int64_t i = 0; i < n; i++) {
            double x = std::fmod(pos[3 * i + 0], period[0]);
            double y = std::fmod(pos[3 * i + 1], period[1]);
            double z = std::fmod(pos[3 * i + 2], period[2]);
            if (x < 0) x += period[0];
            if (y < 0) y += period[1];
            if (z < 0) z += period[2];
            int64_t c = cell_index(cell_coord(x, 0), cell_coord(y, 1),
                                   cell_coord(z, 2));
            cell_of[i] = c;
            count[c]++;
        }
        cell_start.assign(m + 1, 0);
        for (int64_t c = 0; c < m; c++)
            cell_start[c + 1] = cell_start[c] + count[c];
        px.resize(n); py.resize(n); pz.resize(n);
        label.resize(n); orig.resize(n); weight.resize(n);
        std::vector<int64_t> cursor(cell_start.begin(),
                                    cell_start.end() - 1);
        for (int64_t i = 0; i < n; i++) {
            int64_t at = cursor[cell_of[i]]++;
            px[at] = pos[3 * i + 0];
            py[at] = pos[3 * i + 1];
            pz[at] = pos[3 * i + 2];
            label[at] = labels ? labels[i] : 0;
            orig[at] = i;
            weight[at] = weights ? weights[i] : 1.0;
        }
    }
};

inline double min_image(double d, double period) {
    return d - period * std::nearbyint(d / period);
}

inline int bin_of(double value_sq, const double* edges_sq, int n_bins) {
    // Binary search: largest i with edges_sq[i] <= value_sq; -1 if below.
    if (value_sq < edges_sq[0] || value_sq >= edges_sq[n_bins]) return -1;
    int lo = 0, hi = n_bins;
    while (hi - lo > 1) {
        int mid = (lo + hi) / 2;
        if (value_sq >= edges_sq[mid]) lo = mid;
        else hi = mid;
    }
    return lo;
}

// kind: 0 = rppi (rp bins, |dz| < pi_max), 1 = proj (rp bins, any dz),
//       2 = smu ((s, mu) bins).
void count_pairs(const double* pos1, const int32_t* labels1, int64_t n1,
                 const double* pos2, const int32_t* labels2,
                 const double* weights2, int64_t n2, int autocorr,
                 int n_labels_1, int n_labels_2, const double* r_edges_sq,
                 int n_r, double pi_max, int n_mu, const double* period,
                 int kind, int pair_weight, double* out) {
    double rmax[3];
    double r_max = std::sqrt(r_edges_sq[n_r]);
    if (kind == 2) {  // smu: isotropic search radius
        rmax[0] = rmax[1] = rmax[2] = r_max;
    } else {
        rmax[0] = rmax[1] = r_max;
        rmax[2] = (kind == 0) ? pi_max : 0.0;  // proj: full column
    }

    CellList grid;
    grid.build(pos2, labels2, weights2, n2, period, rmax);

    int n_sub = (kind == 2) ? n_r * n_mu : n_r;
    // pair_weight 2 ("unit+log_rp") writes two channels into a doubled
    // histogram: [0, n_hist) unit weights, [n_hist, 2 n_hist) w ln(rp) —
    // one pair enumeration instead of two for the delta-sigma estimator.
    int64_t n_hist = int64_t(n_labels_1) * n_labels_2 * n_sub;
    int64_t n_hist_total = (pair_weight == 2) ? 2 * n_hist : n_hist;

    int n_threads = 1;
#ifdef _OPENMP
    n_threads = omp_get_max_threads();
#endif
    std::vector<std::vector<double>> partial(
        n_threads, std::vector<double>(n_hist_total, 0.0));

    // Neighbor cell offsets per dimension: all cells if fewer than 3.
    std::vector<int> offs[3];
    for (int d = 0; d < 3; d++) {
        if (grid.nc[d] <= 2) {
            for (int c = 0; c < grid.nc[d]; c++) offs[d].push_back(c);
        }
    }

#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 64)
#endif
    for (int64_t i = 0; i < n1; i++) {
        int tid = 0;
#ifdef _OPENMP
        tid = omp_get_thread_num();
#endif
        double* hist = partial[tid].data();
        double x1 = pos1[3 * i + 0], y1 = pos1[3 * i + 1],
               z1 = pos1[3 * i + 2];
        int l1 = labels1 ? labels1[i] : 0;
        if (l1 < 0) continue;
        int64_t base1 = int64_t(l1) * n_labels_2;

        double xw = std::fmod(x1, period[0]);
        double yw = std::fmod(y1, period[1]);
        double zw = std::fmod(z1, period[2]);
        if (xw < 0) xw += period[0];
        if (yw < 0) yw += period[1];
        if (zw < 0) zw += period[2];
        int cx = grid.cell_coord(xw, 0);
        int cy = grid.cell_coord(yw, 1);
        int cz = grid.cell_coord(zw, 2);

        auto visit = [&](int gx, int gy, int gz) {
            int64_t c = grid.cell_index(gx, gy, gz);
            for (int64_t j = grid.cell_start[c];
                 j < grid.cell_start[c + 1]; j++) {
                if (autocorr && grid.orig[j] == i) continue;
                int l2 = grid.label[j];
                if (l2 < 0) continue;
                double dx = min_image(x1 - grid.px[j], period[0]);
                double dy = min_image(y1 - grid.py[j], period[1]);
                double dz = std::fabs(
                    min_image(z1 - grid.pz[j], period[2]));
                double rp_sq = dx * dx + dy * dy;
                int sub;
                if (kind == 2) {
                    double s_sq = rp_sq + dz * dz;
                    int sb = bin_of(s_sq, r_edges_sq, n_r);
                    if (sb < 0 || s_sq <= 0) continue;
                    double mu = dz / std::sqrt(s_sq);
                    int mb = std::min(int(mu * n_mu), n_mu - 1);
                    sub = sb * n_mu + mb;
                } else {
                    if (kind == 0 && dz >= pi_max) continue;
                    sub = bin_of(rp_sq, r_edges_sq, n_r);
                    if (sub < 0) continue;
                }
                double w = grid.weight[j];
                int64_t idx = (base1 + l2) * n_sub + sub;
                // pair_weight 1: accumulate w * ln(rp) for the exact
                // annulus-averaged delta-sigma estimator (rp floored so a
                // coincident pair stays finite); 2: both channels in one
                // pass.
                if (pair_weight == 2) {
                    hist[idx] += w;
                    hist[n_hist + idx] +=
                        w * 0.5 * std::log(std::max(rp_sq, 1e-20));
                } else {
                    if (pair_weight == 1)
                        w *= 0.5 * std::log(std::max(rp_sq, 1e-20));
                    hist[idx] += w;
                }
            }
        };

        // Distinct wrapped neighbor cells in each dimension.
        int seenx[3], seeny[3], seenz[3];
        int nx = 0, ny = 0, nz = 0;
        auto collect = [&](int c, int d, int* seen, int& n_seen) {
            for (int o = -1; o <= 1; o++) {
                int g = c + o;
                if (g < 0) g += grid.nc[d];
                if (g >= grid.nc[d]) g -= grid.nc[d];
                bool dup = false;
                for (int k = 0; k < n_seen; k++)
                    if (seen[k] == g) dup = true;
                if (!dup) seen[n_seen++] = g;
            }
        };
        collect(cx, 0, seenx, nx);
        collect(cy, 1, seeny, ny);
        // kind 'proj' builds a single full-height z cell (rmax_z = 0), so
        // the same neighbor walk covers the whole column.
        collect(cz, 2, seenz, nz);

        for (int a = 0; a < nx; a++)
            for (int b = 0; b < ny; b++)
                for (int g = 0; g < nz; g++)
                    visit(seenx[a], seeny[b], seenz[g]);
    }

    std::memset(out, 0, sizeof(double) * n_hist_total);
    for (int t = 0; t < n_threads; t++)
        for (int64_t h = 0; h < n_hist_total; h++)
            out[h] += partial[t][h];
}

}  // namespace

extern "C" {

// Labeled pair counts; out has n_labels_1 * n_labels_2 * n_r doubles
// ('rppi'/'proj') or * n_r * n_mu ('smu': kind=2); pair_weight 2 doubles
// the out length (unit channel then w*ln(rp) channel).
void tabcorr_count_pairs(const double* pos1, const int32_t* labels1,
                         int64_t n1, const double* pos2,
                         const int32_t* labels2, const double* weights2,
                         int64_t n2, int autocorr, int n_labels_1,
                         int n_labels_2, const double* r_edges_sq, int n_r,
                         double pi_max, int n_mu, const double* period,
                         int kind, int pair_weight, double* out) {
    count_pairs(pos1, labels1, n1, pos2, labels2, weights2, n2, autocorr,
                n_labels_1, n_labels_2, r_edges_sq, n_r, pi_max, n_mu,
                period, kind, pair_weight, out);
}

int tabcorr_native_version() { return 3; }

}  // extern "C"
