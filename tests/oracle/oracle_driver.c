// Oracle driver: runs the REFERENCE planner (linked from /root/reference/src,
// not copied) on a matrix read from a simple text file and dumps the chosen
// grid + boundary arrays as JSON. Used only to (re)generate
// tests/fixtures/planner_oracle.json; the fixture is checked in so the test
// suite does not need a C toolchain.
//
// Input format: "nrow ncol n nproc rA" then nrow+1 rowptr ints, nnz colidx ints.
#include <stdio.h>
#include <stdlib.h>
#include "spmat_part.h"

int main(int argc, char **argv)
{
    if (argc < 2) { fprintf(stderr, "usage: %s <matfile>\n", argv[0]); return 1; }
    FILE *f = fopen(argv[1], "r");
    if (!f) { perror("open"); return 1; }
    int m, k, n, nproc, rA;
    if (fscanf(f, "%d %d %d %d %d", &m, &k, &n, &nproc, &rA) != 5) return 1;
    int *rowptr = malloc(sizeof(int) * (m + 1));
    for (int i = 0; i <= m; i++) fscanf(f, "%d", &rowptr[i]);
    int nnz = rowptr[m];
    int *colidx = malloc(sizeof(int) * nnz);
    for (int i = 0; i < nnz; i++) fscanf(f, "%d", &colidx[i]);
    fclose(f);

    int *rb_displs = malloc(sizeof(int) * (nproc + 1));
    csr_mat_row_partition(m, rowptr, nproc, rb_displs);

    int pm = 0, pn = 0;
    size_t comm_cost = 0;
    int *A0_rowptr = NULL, *B_rowptr = NULL, *AC_rowptr = NULL, *BC_colptr = NULL;
    calc_spmm_part2d_from_1d(
        nproc, m, n, k, rb_displs, rowptr, colidx, rA,
        &pm, &pn, &comm_cost, &A0_rowptr, &B_rowptr, &AC_rowptr, &BC_colptr, 0
    );

    printf("{\"pm\": %d, \"pn\": %d, \"comm_cost\": %zu", pm, pn, comm_cost);
    printf(", \"rb_displs0\": [");
    for (int i = 0; i <= nproc; i++) printf("%s%d", i ? ", " : "", rb_displs[i]);
    printf("], \"A0_rowptr\": [");
    for (int i = 0; i <= nproc; i++) printf("%s%d", i ? ", " : "", A0_rowptr[i]);
    printf("], \"B_rowptr\": [");
    for (int i = 0; i <= pm; i++) printf("%s%d", i ? ", " : "", B_rowptr[i]);
    printf("], \"AC_rowptr\": [");
    for (int i = 0; i <= pm; i++) printf("%s%d", i ? ", " : "", AC_rowptr[i]);
    printf("], \"BC_colptr\": [");
    for (int i = 0; i <= pn; i++) printf("%s%d", i ? ", " : "", BC_colptr[i]);
    printf("]}\n");
    return 0;
}
