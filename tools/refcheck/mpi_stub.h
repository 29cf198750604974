/* Single-rank MPI stub: lets the C++ reference (/root/reference, which
 * hard-requires <mpi.h>) compile and run as ONE rank on a box with no MPI
 * installation, so its physics output can be used as golden data for the
 * statistical cross-validation gate (tools/refcheck/run_goldens.py).
 *
 * At size==1 the reference takes its no-communication fast paths everywhere
 * (e.g. src/dirac_operator.cpp:28, src/gauge_conf.cpp:44), so only trivial
 * semantics are needed here:
 *   - Allreduce / Gatherv / Scatterv degenerate to memcpy
 *   - Bcast / Type_commit / Init / Finalize are no-ops
 *   - the 2D Cartesian topology is a single cell (all neighbors = rank 0)
 *   - Send/Recv abort loudly: they must never be reached at size 1
 *
 * MPI_Datatype is encoded directly as the type's size in bytes; derived
 * types (Type_vector / Type_create_resized, used only for the rank-0 I/O
 * block redistribution, include/mpi_setup.h:73-94) carry their total payload
 * size, which at one rank equals the whole-array copy the collectives do.
 */
#ifndef SINGLE_RANK_MPI_STUB_H
#define SINGLE_RANK_MPI_STUB_H

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>

typedef int MPI_Comm;
typedef long long MPI_Datatype; /* == size of the type in bytes */
typedef int MPI_Op;
typedef struct { int MPI_SOURCE, MPI_TAG, MPI_ERROR; } MPI_Status;
typedef long MPI_Aint;

#define MPI_COMM_WORLD 0
#define MPI_SUM 0
#define MPI_SUCCESS 0
#define MPI_IN_PLACE ((void *)(-1))
#define MPI_STATUS_IGNORE ((MPI_Status *)0)

#define MPI_CHAR ((MPI_Datatype)1)
#define MPI_INT ((MPI_Datatype)4)
#define MPI_DOUBLE ((MPI_Datatype)8)
#define MPI_DOUBLE_COMPLEX ((MPI_Datatype)16)

static inline int MPI_Init(int *, char ***) { return MPI_SUCCESS; }
static inline int MPI_Finalize(void) { return MPI_SUCCESS; }
static inline int MPI_Comm_size(MPI_Comm, int *size) { *size = 1; return MPI_SUCCESS; }
static inline int MPI_Comm_rank(MPI_Comm, int *rank) { *rank = 0; return MPI_SUCCESS; }

static inline double MPI_Wtime(void) {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return (double)ts.tv_sec + 1e-9 * (double)ts.tv_nsec;
}

static inline int MPI_Cart_create(MPI_Comm comm, int ndims, const int *dims,
                                  const int *, int, MPI_Comm *newcomm) {
    long long n = 1;
    for (int i = 0; i < ndims; ++i) n *= dims[i];
    if (n != 1) {
        std::fprintf(stderr, "mpi_stub: only 1 rank supported (asked %lld)\n", n);
        std::abort();
    }
    *newcomm = comm;
    return MPI_SUCCESS;
}
static inline int MPI_Cart_coords(MPI_Comm, int, int maxdims, int *coords) {
    for (int i = 0; i < maxdims; ++i) coords[i] = 0;
    return MPI_SUCCESS;
}
static inline int MPI_Cart_shift(MPI_Comm, int, int, int *src, int *dst) {
    *src = 0; *dst = 0; return MPI_SUCCESS;
}
static inline int MPI_Cart_rank(MPI_Comm, const int *, int *rank) {
    *rank = 0; return MPI_SUCCESS;
}

static inline int MPI_Type_vector(int count, int blocklength, int,
                                  MPI_Datatype oldtype, MPI_Datatype *newtype) {
    *newtype = (MPI_Datatype)count * blocklength * oldtype;
    return MPI_SUCCESS;
}
static inline int MPI_Type_create_resized(MPI_Datatype oldtype, MPI_Aint,
                                          MPI_Aint, MPI_Datatype *newtype) {
    *newtype = oldtype;
    return MPI_SUCCESS;
}
static inline int MPI_Type_commit(MPI_Datatype *) { return MPI_SUCCESS; }

static inline int MPI_Bcast(void *, int, MPI_Datatype, int, MPI_Comm) {
    return MPI_SUCCESS;
}
static inline int MPI_Allreduce(const void *sendbuf, void *recvbuf, int count,
                                MPI_Datatype type, MPI_Op, MPI_Comm) {
    if (sendbuf != MPI_IN_PLACE && sendbuf != recvbuf)
        std::memcpy(recvbuf, sendbuf, (size_t)count * (size_t)type);
    return MPI_SUCCESS;
}
static inline int MPI_Gatherv(const void *sendbuf, int sendcount,
                              MPI_Datatype sendtype, void *recvbuf,
                              const int *, const int *, MPI_Datatype, int,
                              MPI_Comm) {
    if (sendbuf != recvbuf)
        std::memcpy(recvbuf, sendbuf, (size_t)sendcount * (size_t)sendtype);
    return MPI_SUCCESS;
}
static inline int MPI_Scatterv(const void *sendbuf, const int *, const int *,
                               MPI_Datatype, void *recvbuf, int recvcount,
                               MPI_Datatype recvtype, int, MPI_Comm) {
    if (sendbuf != recvbuf)
        std::memcpy(recvbuf, sendbuf, (size_t)recvcount * (size_t)recvtype);
    return MPI_SUCCESS;
}

static inline int MPI_Send(const void *, int, MPI_Datatype, int, int, MPI_Comm) {
    std::fprintf(stderr, "mpi_stub: MPI_Send reached at size==1 -- bug\n");
    std::abort();
}
static inline int MPI_Recv(void *, int, MPI_Datatype, int, int, MPI_Comm,
                           MPI_Status *) {
    std::fprintf(stderr, "mpi_stub: MPI_Recv reached at size==1 -- bug\n");
    std::abort();
}

#endif /* SINGLE_RANK_MPI_STUB_H */
