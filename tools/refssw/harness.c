/* Parity harness driving the REFERENCE's own Smith-Waterman kernel
 * (/root/reference/src/sortmerna/ssw.c, compiled in place by build.sh --
 * nothing copied into the repo) the exact way the reference engine does
 * (alignment.cpp:363-381): ssw_init(query, m, mat5x5, 5, score_size=2)
 * then ssw_align(prof, ref, n, gapO, gapE, flag=2, filters, 0, 0).
 *
 * stdin, one case per record:
 *   m n gapO gapE filters
 *   <query: m digits 0-4>
 *   <ref:   n digits 0-4>
 *   <25 ints: row-major 5x5 scoring matrix>
 * stdout, one line per case:
 *   score1 ref_begin1 ref_end1 read_begin1 read_end1 cigarLen [cigar...]
 * or "NULL" when ssw_align returns no alignment.
 */
#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>
#include "ssw.h"

int main(void) {
    int m, n, gapO, gapE, filters;
    while (scanf("%d %d %d %d %d", &m, &n, &gapO, &gapE, &filters) == 5) {
        char* qs = (char*)malloc((size_t)m + 8);
        char* rs = (char*)malloc((size_t)n + 8);
        int8_t* q = (int8_t*)malloc((size_t)m);
        int8_t* r = (int8_t*)malloc((size_t)n);
        int8_t mat[25];
        int i, v;
        if (scanf("%s", qs) != 1 || scanf("%s", rs) != 1) return 1;
        for (i = 0; i < m; i++) q[i] = (int8_t)(qs[i] - '0');
        for (i = 0; i < n; i++) r[i] = (int8_t)(rs[i] - '0');
        for (i = 0; i < 25; i++) {
            if (scanf("%d", &v) != 1) return 1;
            mat[i] = (int8_t)v;
        }
        s_profile* prof = ssw_init(q, m, mat, 5, 2);
        s_align* res = ssw_align(prof, r, n, (uint8_t)gapO, (uint8_t)gapE,
                                 2, (uint16_t)filters, 0, 0);
        if (!res) {
            printf("NULL\n");
        } else {
            printf("%d %d %d %d %d %d", (int)res->score1,
                   (int)res->ref_begin1, (int)res->ref_end1,
                   (int)res->read_begin1, (int)res->read_end1,
                   (int)res->cigarLen);
            for (i = 0; i < (int)res->cigarLen; i++)
                printf(" %u", res->cigar[i]);
            printf("\n");
            if (res->cigar) free(res->cigar);
            free(res);
        }
        init_destroy(&prof);
        free(q); free(r); free(qs); free(rs);
        fflush(stdout);
    }
    return 0;
}
