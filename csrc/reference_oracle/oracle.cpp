// Reference-as-oracle driver: runs the REAL RAPtor C++ setup pipeline
// single-rank (through the csrc/mpi1 shim) and dumps the hierarchy so
// tests/test_reference_oracle.py can diff our levels against the
// reference implementation live — the analog of the reference's own
// hypre_compare.hpp:11 third-oracle harness, with RAPtor itself as the
// independent implementation.
//
// Usage: oracle <aniso|lap27|PATH.pm> <n> <coarsen> <interp> <threshold>
//        <outdir> [rhs.bin]
//   rhs.bin (optional): int32 n + f64[n] right-hand side. When given
//   the driver runs in SOLVE mode — the external-solver wrapper analog
//   of the reference's own hypre_wrapper.cpp:205-244 creators: solve
//   A x = b from x0 = 0, write <outdir>/x.bin (same binary layout) and
//   <outdir>/residuals.txt, and skip the per-level hierarchy dumps.
//   problem: the two gallery stencils, or any .pm matrix file (read by
//            the reference's own readParMatrix — this makes the oracle
//            a live external-solver wrapper for ARBITRARY operators,
//            the hypre_wrapper.cpp:205-244 creator analog; <n> ignored)
//   coarsen: RS | CLJP | Falgout | PMIS | HMIS | SA
//            (SA = ParSmoothedAggregationSolver, MIS aggregation +
//             Jacobi-smoothed prolongation; <interp> is then ignored)
//   interp:  Direct | ModClassical | Extended
//
// Output: <outdir>/summary.txt (rows/nnz per level) and per-level
// binary CSR dumps L<i>_P.bin (int32 header/indptr/indices + f64 vals,
// columns in GLOBAL numbering).

#include <mpi.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "raptor/raptor.hpp"

using namespace raptor;

static void dump_par_csr(ParCSRMatrix* m, const char* path)
{
    // single rank: local == global rows; off_proc columns map through
    // off_proc_column_map (P's coarse columns are split on/off in the
    // reference layout even at 1 rank)
    FILE* f = fopen(path, "wb");
    int32_t n_rows = m->local_num_rows;
    int32_t n_cols = (int32_t)m->global_num_cols;
    std::vector<int32_t> indptr(n_rows + 1, 0);
    std::vector<int32_t> cols;
    std::vector<double> vals;
    for (int i = 0; i < n_rows; i++)
    {
        std::vector<std::pair<int32_t, double> > row;
        for (int j = m->on_proc->idx1[i]; j < m->on_proc->idx1[i + 1]; j++)
        {
            // on_proc columns are contiguous global ids from the column
            // partition (P's on_proc_column_map holds the coarse
            // points' FINE row ids, not coarse numbering)
            int32_t c = (int32_t)(m->partition->first_local_col
                                  + m->on_proc->idx2[j]);
            row.push_back(std::make_pair(c, m->on_proc->vals[j]));
        }
        for (int j = m->off_proc->idx1[i]; j < m->off_proc->idx1[i + 1]; j++)
        {
            int32_t c = (int32_t)m->off_proc_column_map[m->off_proc->idx2[j]];
            row.push_back(std::make_pair(c, m->off_proc->vals[j]));
        }
        std::sort(row.begin(), row.end());
        for (size_t k = 0; k < row.size(); k++)
        {
            cols.push_back(row[k].first);
            vals.push_back(row[k].second);
        }
        indptr[i + 1] = (int32_t)cols.size();
    }
    int32_t nnz = (int32_t)cols.size();
    fwrite(&n_rows, 4, 1, f);
    fwrite(&n_cols, 4, 1, f);
    fwrite(&nnz, 4, 1, f);
    fwrite(indptr.data(), 4, indptr.size(), f);
    fwrite(cols.data(), 4, cols.size(), f);
    fwrite(vals.data(), 8, vals.size(), f);
    fclose(f);
}

int main(int argc, char** argv)
{
    MPI_Init(&argc, &argv);
    if (argc < 7)
    {
        fprintf(stderr, "usage: oracle <aniso|lap27> <n> <coarsen> "
                        "<interp> <threshold> <outdir>\n");
        return 2;
    }
    std::string prob = argv[1];
    int n = atoi(argv[2]);
    std::string co = argv[3];
    std::string in = argv[4];
    double threshold = atof(argv[5]);
    std::string outdir = argv[6];

    ParCSRMatrix* A;
    if (prob.size() > 3 && prob.substr(prob.size() - 3) == ".pm")
    {
        A = readParMatrix(prob.c_str());
    }
    else if (prob == "lap27")
    {
        std::vector<int> grid(3, n);
        double* stencil = laplace_stencil_27pt();
        A = par_stencil_grid(stencil, grid.data(), 3);
        delete[] stencil;
    }
    else
    {
        std::vector<int> grid(2, n);
        double* stencil = diffusion_stencil_2d(0.001, M_PI / 8.0);
        A = par_stencil_grid(stencil, grid.data(), 2);
        delete[] stencil;
    }

    ParMultilevel* ml;
    if (co == "SA")
    {
        ml = new ParSmoothedAggregationSolver(threshold);
    }
    else
    {
        coarsen_t ct = co == "RS" ? RS : co == "CLJP" ? CLJP :
                       co == "Falgout" ? Falgout :
                       co == "PMIS" ? PMIS : HMIS;
        interp_t it = in == "Direct" ? Direct :
                      in == "ModClassical" ? ModClassical : Extended;
        ml = new ParRugeStubenSolver(threshold, ct, it, Classical, SOR);
    }
    ml->track_times = false;
    ml->setup(A);

    ParVector x(A->global_num_cols, A->on_proc_num_cols);
    ParVector b(A->global_num_rows, A->local_num_rows);
    char path[4096];

    if (argc >= 8)
    {
        // SOLVE mode: external rhs in, solution + residuals out
        FILE* rf = fopen(argv[7], "rb");
        if (!rf)
        {
            fprintf(stderr, "cannot read rhs %s\n", argv[7]);
            return 2;
        }
        int32_t nb = 0;
        if (fread(&nb, 4, 1, rf) != 1 || nb != A->local_num_rows)
        {
            fprintf(stderr, "rhs length %d != rows %d\n", (int)nb,
                    A->local_num_rows);
            return 2;
        }
        if (fread(b.local.values.data(), 8, nb, rf) != (size_t)nb)
        {
            fprintf(stderr, "short rhs read\n");
            return 2;
        }
        fclose(rf);
        x.set_const_value(0.0);
        ml->max_iterations = 200;
        ml->store_residuals = true;
        int iters = ml->solve(x, b);

        snprintf(path, sizeof(path), "%s/x.bin", outdir.c_str());
        FILE* xf = fopen(path, "wb");
        int32_t nx = (int32_t)A->on_proc_num_cols;
        fwrite(&nx, 4, 1, xf);
        fwrite(x.local.values.data(), 8, nx, xf);
        fclose(xf);
        snprintf(path, sizeof(path), "%s/residuals.txt", outdir.c_str());
        FILE* rs = fopen(path, "w");
        std::vector<double>& res = ml->get_residuals();
        for (int i = 0; i <= iters && i < (int)res.size(); i++)
            fprintf(rs, "%.17e\n", res[i]);
        fclose(rs);
        snprintf(path, sizeof(path), "%s/summary.txt", outdir.c_str());
        FILE* s = fopen(path, "w");
        fprintf(s, "iters %d\n", iters);
        for (int i = 0; i < ml->num_levels; i++)
            fprintf(s, "%d %ld %ld\n", i,
                    (long)ml->levels[i]->A->global_num_rows,
                    (long)ml->levels[i]->A->local_nnz);
        fclose(s);
        delete ml;
        delete A;
        MPI_Finalize();
        return 0;
    }

    // preconditioner-quality probe: V-cycle iterations to the solver's
    // relative tolerance on b = A*ones (par_multilevel.hpp:461-497)
    x.set_const_value(1.0);
    A->mult(x, b);
    x.set_const_value(0.0);
    ml->max_iterations = 200;
    int iters = ml->solve(x, b);

    snprintf(path, sizeof(path), "%s/summary.txt", outdir.c_str());
    FILE* s = fopen(path, "w");
    fprintf(s, "iters %d\n", iters);
    for (int i = 0; i < ml->num_levels; i++)
    {
        ParCSRMatrix* Al = ml->levels[i]->A;
        long nnz = Al->local_nnz;
        fprintf(s, "%d %ld %ld\n", i, (long)Al->global_num_rows, nnz);
        snprintf(path, sizeof(path), "%s/L%d_A.bin", outdir.c_str(), i);
        dump_par_csr(Al, path);
        if (ml->levels[i]->P)
        {
            snprintf(path, sizeof(path), "%s/L%d_P.bin", outdir.c_str(),
                     i);
            dump_par_csr(ml->levels[i]->P, path);
        }
    }
    fclose(s);

    delete ml;
    delete A;
    MPI_Finalize();
    return 0;
}
