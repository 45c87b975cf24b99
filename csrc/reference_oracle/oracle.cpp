// Reference-as-oracle driver: runs the REAL RAPtor C++ setup pipeline
// single-rank (through the csrc/mpi1 shim) and dumps the hierarchy so
// tests/test_reference_oracle.py can diff our levels against the
// reference implementation live — the analog of the reference's own
// hypre_compare.hpp:11 third-oracle harness, with RAPtor itself as the
// independent implementation.
//
// Usage: oracle <aniso|lap27|PATH.pm> <n> <coarsen> <interp> <threshold>
//        <outdir> [rhs.bin | stages]
//   rhs.bin (optional): int32 n + f64[n] right-hand side. When given
//   the driver runs in SOLVE mode — the external-solver wrapper analog
//   of the reference's own hypre_wrapper.cpp:205-244 creators: solve
//   A x = b from x0 = 0, write <outdir>/x.bin (same binary layout) and
//   <outdir>/residuals.txt, and skip the per-level hierarchy dumps.
//   "stages" (literal): STAGE-DUMP mode — replicate
//   ParRugeStubenSolver::extend_hierarchy level by level OUTSIDE the
//   solver class, dumping the per-level strength matrix (L<i>_S.bin),
//   CF splitting states (L<i>_cf.bin: int32 n + int32[n], the
//   Selected/Unselected codes of core/types.hpp:29-35), P and A. This
//   is the reference's own per-stage diffing discipline
//   (ruge_stuben/tests/test_hypre_splitting.cpp, test_hypre_strength.cpp)
//   so a semantics divergence on a new operator localizes to its stage
//   in one test run instead of a round of bisection. RS-family only.
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

    if (argc >= 8 && strcmp(argv[7], "stages") == 0)
    {
        // STAGE-DUMP mode: run the RS pipeline stages by hand
        // (par_ruge_stuben_solver.hpp:55-169 replicated) so S and the
        // CF states — which ParMultilevel::setup discards — can be
        // dumped per level.
        if (co == "SA")
        {
            fprintf(stderr, "stages mode is RS-family only\n");
            return 2;
        }
        coarsen_t ct = co == "RS" ? RS : co == "CLJP" ? CLJP :
                       co == "Falgout" ? Falgout :
                       co == "PMIS" ? PMIS : HMIS;
        interp_t it = in == "Direct" ? Direct :
                      in == "ModClassical" ? ModClassical : Extended;
        const double interp_filter = 0.3;   // solver ctor default

        ParCSRMatrix* Ac = A->copy();
        Ac->sort();
        Ac->on_proc->move_diag();
        // fine-level weights, reused at every level
        // (par_multilevel.hpp:159-217: srand(2448422 + first_row))
        std::vector<double> weights(Ac->local_num_rows);
        srand(2448422 + Ac->partition->first_local_row);
        for (int i = 0; i < Ac->local_num_rows; i++)
            weights[i] = double(rand()) / RAND_MAX;

        char path[4096];
        snprintf(path, sizeof(path), "%s/summary.txt", outdir.c_str());
        FILE* s = fopen(path, "w");
        fprintf(s, "iters -1\n");
        int lvl = 0;
        while (Ac->global_num_rows > 50 && lvl < 25)
        {
            fprintf(s, "%d %ld %ld\n", lvl, (long)Ac->global_num_rows,
                    (long)Ac->local_nnz);
            snprintf(path, sizeof(path), "%s/L%d_A.bin", outdir.c_str(),
                     lvl);
            dump_par_csr(Ac, path);

            ParCSRMatrix* S = Ac->strength(Classical, threshold, false,
                                           1, NULL);
            snprintf(path, sizeof(path), "%s/L%d_S.bin", outdir.c_str(),
                     lvl);
            dump_par_csr(S, path);

            std::vector<int> states;
            std::vector<int> off_proc_states;
            switch (ct)
            {
                case RS:
                    if (lvl < 3)
                        split_rs(S, states, off_proc_states, false);
                    else
                        split_falgout(S, states, off_proc_states, false,
                                      weights.data());
                    break;
                case CLJP:
                    split_cljp(S, states, off_proc_states, false,
                               weights.data());
                    break;
                case Falgout:
                    split_falgout(S, states, off_proc_states, false,
                                  weights.data());
                    break;
                case PMIS:
                    split_pmis(S, states, off_proc_states, false,
                               weights.data());
                    break;
                default:
                    split_hmis(S, states, off_proc_states, false,
                               weights.data());
                    break;
            }
            snprintf(path, sizeof(path), "%s/L%d_cf.bin", outdir.c_str(),
                     lvl);
            FILE* cf = fopen(path, "wb");
            int32_t ns = (int32_t)states.size();
            fwrite(&ns, 4, 1, cf);
            std::vector<int32_t> st32(states.begin(), states.end());
            fwrite(st32.data(), 4, st32.size(), cf);
            fclose(cf);

            ParCSRMatrix* P;
            switch (it)
            {
                case Direct:
                    P = direct_interpolation(Ac, S, states,
                                             off_proc_states, false);
                    break;
                case ModClassical:
                    P = mod_classical_interpolation(
                            Ac, S, states, off_proc_states, false, 1,
                            NULL);
                    break;
                default:
                    P = extended_interpolation(
                            Ac, S, states, off_proc_states,
                            interp_filter, false, 1, NULL);
                    break;
            }
            snprintf(path, sizeof(path), "%s/L%d_P.bin", outdir.c_str(),
                     lvl);
            dump_par_csr(P, path);

            ParCSRMatrix* AP = Ac->mult(P, false);
            ParCSRMatrix* An = AP->mult_T(P, false);
            An->sort();
            An->on_proc->move_diag();
            An->comm = new ParComm(An->partition, An->off_proc_column_map,
                                   An->on_proc_column_map, Ac->comm->key,
                                   Ac->comm->mpi_comm);
            delete AP;
            delete S;
            delete P;
            delete Ac;
            Ac = An;
            lvl++;
        }
        fprintf(s, "%d %ld %ld\n", lvl, (long)Ac->global_num_rows,
                (long)Ac->local_nnz);
        snprintf(path, sizeof(path), "%s/L%d_A.bin", outdir.c_str(), lvl);
        dump_par_csr(Ac, path);
        fclose(s);
        delete Ac;
        delete A;
        MPI_Finalize();
        return 0;
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
