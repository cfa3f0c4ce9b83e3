/* Minimal CBLAS declarations for building the reference oracle binary
   against the system libblas.so.3 (which exports cblas_* symbols but
   ships no development header in this image).  Only the symbols the
   reference's blas_wrapper.cpp uses are declared. */
#ifndef ANISO_ORACLE_CBLAS_SHIM_H
#define ANISO_ORACLE_CBLAS_SHIM_H
#ifdef __cplusplus
extern "C" {
#endif

typedef enum CBLAS_ORDER { CblasRowMajor = 101, CblasColMajor = 102 } CBLAS_ORDER;
typedef enum CBLAS_TRANSPOSE { CblasNoTrans = 111, CblasTrans = 112, CblasConjTrans = 113 } CBLAS_TRANSPOSE;
typedef enum CBLAS_UPLO { CblasUpper = 121, CblasLower = 122 } CBLAS_UPLO;

void cblas_dscal(int N, double alpha, double *X, int incX);
void cblas_daxpy(int N, double alpha, const double *X, int incX, double *Y, int incY);
double cblas_ddot(int N, const double *X, int incX, const double *Y, int incY);
double cblas_dnrm2(int N, const double *X, int incX);
void cblas_dgemv(CBLAS_ORDER order, CBLAS_TRANSPOSE TransA, int M, int N,
                 double alpha, const double *A, int lda, const double *X,
                 int incX, double beta, double *Y, int incY);
void cblas_dger(CBLAS_ORDER order, int M, int N, double alpha,
                const double *X, int incX, const double *Y, int incY,
                double *A, int lda);
void cblas_dsbmv(CBLAS_ORDER order, CBLAS_UPLO Uplo, int N, int K,
                 double alpha, const double *A, int lda, const double *X,
                 int incX, double beta, double *Y, int incY);
void cblas_dgemm(CBLAS_ORDER Order, CBLAS_TRANSPOSE TransA,
                 CBLAS_TRANSPOSE TransB, int M, int N, int K, double alpha,
                 const double *A, int lda, const double *B, int ldb,
                 double beta, double *C, int ldc);

#ifdef __cplusplus
}
#endif
#endif
