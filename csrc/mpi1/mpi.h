// Single-rank MPI shim: just enough of the MPI-3 surface to build and
// run the reference RAPtor library as a ONE-PROCESS test oracle (the
// repo's hypre_compare analog — tests/test_reference_oracle.py diffs
// our hierarchies level-by-level against the real C++ implementation).
//
// Semantics at world size 1:
//   - collectives are memcpys (or no-ops with MPI_IN_PLACE)
//   - point-to-point is a tag-matched self-mailbox (buffered sends);
//     an unmatched blocking receive is a guaranteed deadlock, so it
//     aborts loudly instead of hanging
//   - communicators/groups are trivial (every split/dup is the world)
//
// This header is original shim code (NOT copied from any MPI
// implementation); only the standard MPI API names/signatures appear.

#ifndef RAPTOR_TPU_MPI1_SHIM_H_
#define RAPTOR_TPU_MPI1_SHIM_H_

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <deque>
#include <map>
#include <vector>

// ---- basic types -----------------------------------------------------------
typedef int MPI_Comm;
typedef int MPI_Datatype;   // encodes the element size in bytes
typedef int MPI_Op;
typedef int MPI_Group;
typedef int MPI_Request;
typedef struct {
    int MPI_SOURCE;
    int MPI_TAG;
    int _bytes;
} MPI_Status;

#define MPI_COMM_WORLD   1
#define MPI_COMM_NULL    0
#define MPI_COMM_SELF    2
#define MPI_SUCCESS      0
#define MPI_ANY_SOURCE   (-1)
#define MPI_ANY_TAG      (-1)
#define MPI_REQUEST_NULL 0
#define MPI_GROUP_NULL   0
#define MPI_UNDEFINED    (-32766)

// datatype value == size in bytes (only the size matters at world 1)
#define MPI_PACKED      1
#define MPI_BYTE        1
#define MPI_CHAR        1
#define MPI_INT         4
#define MPI_FLOAT       (4 + 0x1000)   // distinct value, size & 0xFFF
#define MPI_DOUBLE      8
#define MPI_LONG        (8 + 0x1000)
#define MPI_LONG_LONG   (8 + 0x2000)
#define MPI_UNSIGNED    (4 + 0x1000)
#define MPI_UNSIGNED_LONG (8 + 0x3000)
#define MPI_DOUBLE_INT  16

#define MPI_SUM 1
#define MPI_MAX 2
#define MPI_MIN 3
#define MPI_BOR 4
#define MPI_LOR 5

#define MPI_IN_PLACE ((void*)-1)
#define MPI_STATUS_IGNORE ((MPI_Status*)0)
#define MPI_STATUSES_IGNORE ((MPI_Status*)0)

static inline int mpi1_dtsize(MPI_Datatype dt) { return dt & 0xFFF; }

// ---- self-mailbox ----------------------------------------------------------
struct Mpi1Msg { int tag; std::vector<char> data; };
struct Mpi1PendingRecv { void* buf; int max_bytes; int tag; int done;
                         int got_bytes; };

struct Mpi1State {
    std::deque<Mpi1Msg> inbox;
    std::vector<Mpi1PendingRecv> recvs;   // index+1 == request id
};
static inline Mpi1State& mpi1_state() {
    static Mpi1State s;
    return s;
}

static inline Mpi1Msg* mpi1_find(int tag) {
    for (auto& m : mpi1_state().inbox)
        if (tag == MPI_ANY_TAG || m.tag == tag) return &m;
    return nullptr;
}

static inline void mpi1_pop(Mpi1Msg* m) {
    auto& ib = mpi1_state().inbox;
    for (auto it = ib.begin(); it != ib.end(); ++it)
        if (&*it == m) { ib.erase(it); return; }
}

static inline void mpi1_progress() {
    for (auto& pr : mpi1_state().recvs) {
        if (pr.done) continue;
        Mpi1Msg* m = mpi1_find(pr.tag);
        if (!m) continue;
        int n = (int)m->data.size();
        if (n > pr.max_bytes) n = pr.max_bytes;
        memcpy(pr.buf, m->data.data(), n);
        pr.got_bytes = n;
        pr.done = 1;
        mpi1_pop(m);
    }
}

static inline void mpi1_die(const char* what) {
    fprintf(stderr, "mpi1 shim: %s would deadlock at world size 1\n",
            what);
    abort();
}

// ---- init / world ----------------------------------------------------------
static inline int MPI_Init(int*, char***) { return MPI_SUCCESS; }
static inline int MPI_Finalize() { return MPI_SUCCESS; }
static inline int MPI_Comm_rank(MPI_Comm, int* r) { *r = 0; return 0; }
static inline int MPI_Comm_size(MPI_Comm, int* s) { *s = 1; return 0; }
static inline int MPI_Barrier(MPI_Comm) { return MPI_SUCCESS; }
static inline int MPI_Ibarrier(MPI_Comm, MPI_Request* rq) {
    *rq = MPI_REQUEST_NULL; return MPI_SUCCESS;
}
static inline double MPI_Wtime() {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return (double)ts.tv_sec + 1e-9 * (double)ts.tv_nsec;
}
static inline int MPI_Abort(MPI_Comm, int code) { exit(code); }

// ---- communicators / groups -------------------------------------------------
static inline int MPI_Comm_dup(MPI_Comm c, MPI_Comm* out) {
    *out = c; return MPI_SUCCESS;
}
static inline int MPI_Comm_free(MPI_Comm* c) {
    *c = MPI_COMM_NULL; return MPI_SUCCESS;
}
static inline int MPI_Comm_split(MPI_Comm, int color, int, MPI_Comm* out) {
    *out = (color == MPI_UNDEFINED) ? MPI_COMM_NULL : MPI_COMM_WORLD;
    return MPI_SUCCESS;
}
static inline int MPI_Comm_group(MPI_Comm, MPI_Group* g) {
    *g = 1; return MPI_SUCCESS;
}
static inline int MPI_Group_incl(MPI_Group, int n, const int*,
                                 MPI_Group* out) {
    *out = n > 0 ? 1 : MPI_GROUP_NULL; return MPI_SUCCESS;
}
static inline int MPI_Group_free(MPI_Group* g) {
    *g = MPI_GROUP_NULL; return MPI_SUCCESS;
}
static inline int MPI_Comm_create_group(MPI_Comm, MPI_Group g, int,
                                        MPI_Comm* out) {
    *out = (g == MPI_GROUP_NULL) ? MPI_COMM_NULL : MPI_COMM_WORLD;
    return MPI_SUCCESS;
}

// ---- collectives (world 1: copies) ------------------------------------------
static inline int MPI_Allreduce(const void* send, void* recv, int count,
                                MPI_Datatype dt, MPI_Op, MPI_Comm) {
    if (send != MPI_IN_PLACE && send != recv)
        memcpy(recv, send, (size_t)count * mpi1_dtsize(dt));
    return MPI_SUCCESS;
}
static inline int MPI_Iallreduce(const void* send, void* recv, int count,
                                 MPI_Datatype dt, MPI_Op op, MPI_Comm c,
                                 MPI_Request* rq) {
    MPI_Allreduce(send, recv, count, dt, op, c);
    *rq = MPI_REQUEST_NULL;
    return MPI_SUCCESS;
}
static inline int MPI_Reduce(const void* send, void* recv, int count,
                             MPI_Datatype dt, MPI_Op, int, MPI_Comm) {
    if (send != MPI_IN_PLACE && send != recv)
        memcpy(recv, send, (size_t)count * mpi1_dtsize(dt));
    return MPI_SUCCESS;
}
static inline int MPI_Allgather(const void* send, int scount,
                                MPI_Datatype sdt, void* recv, int,
                                MPI_Datatype, MPI_Comm) {
    if (send != MPI_IN_PLACE && send != recv)
        memcpy(recv, send, (size_t)scount * mpi1_dtsize(sdt));
    return MPI_SUCCESS;
}
static inline int MPI_Allgatherv(const void* send, int scount,
                                 MPI_Datatype sdt, void* recv, const int*,
                                 const int* displs, MPI_Datatype rdt,
                                 MPI_Comm) {
    char* dst = (char*)recv + (size_t)displs[0] * mpi1_dtsize(rdt);
    if (send != MPI_IN_PLACE && send != dst)
        memcpy(dst, send, (size_t)scount * mpi1_dtsize(sdt));
    return MPI_SUCCESS;
}
static inline int MPI_Gather(const void* send, int scount,
                             MPI_Datatype sdt, void* recv, int,
                             MPI_Datatype, int, MPI_Comm) {
    if (send != MPI_IN_PLACE && send != recv)
        memcpy(recv, send, (size_t)scount * mpi1_dtsize(sdt));
    return MPI_SUCCESS;
}
static inline int MPI_Gatherv(const void* send, int scount,
                              MPI_Datatype sdt, void* recv, const int*,
                              const int* displs, MPI_Datatype rdt, int,
                              MPI_Comm) {
    char* dst = (char*)recv + (size_t)displs[0] * mpi1_dtsize(rdt);
    if (send != MPI_IN_PLACE && send != dst)
        memcpy(dst, send, (size_t)scount * mpi1_dtsize(sdt));
    return MPI_SUCCESS;
}
static inline int MPI_Bcast(void*, int, MPI_Datatype, int, MPI_Comm) {
    return MPI_SUCCESS;
}

// ---- point-to-point (self-mailbox) -------------------------------------------
static inline int MPI_Send(const void* buf, int count, MPI_Datatype dt,
                           int, int tag, MPI_Comm) {
    Mpi1Msg m;
    m.tag = tag;
    m.data.assign((const char*)buf,
                  (const char*)buf + (size_t)count * mpi1_dtsize(dt));
    mpi1_state().inbox.push_back(std::move(m));
    mpi1_progress();
    return MPI_SUCCESS;
}
static inline int MPI_Isend(const void* buf, int count, MPI_Datatype dt,
                            int dest, int tag, MPI_Comm c,
                            MPI_Request* rq) {
    MPI_Send(buf, count, dt, dest, tag, c);
    *rq = MPI_REQUEST_NULL;
    return MPI_SUCCESS;
}
static inline int MPI_Issend(const void* buf, int count, MPI_Datatype dt,
                             int dest, int tag, MPI_Comm c,
                             MPI_Request* rq) {
    return MPI_Isend(buf, count, dt, dest, tag, c, rq);
}
static inline int MPI_Recv(void* buf, int count, MPI_Datatype dt, int,
                           int tag, MPI_Comm, MPI_Status* st) {
    mpi1_progress();
    Mpi1Msg* m = mpi1_find(tag);
    if (!m) mpi1_die("MPI_Recv with empty mailbox");
    size_t n = m->data.size();
    size_t cap = (size_t)count * mpi1_dtsize(dt);
    if (n > cap) n = cap;
    memcpy(buf, m->data.data(), n);
    if (st) { st->MPI_SOURCE = 0; st->MPI_TAG = m->tag;
              st->_bytes = (int)n; }
    mpi1_pop(m);
    return MPI_SUCCESS;
}
static inline int MPI_Irecv(void* buf, int count, MPI_Datatype dt, int,
                            int tag, MPI_Comm, MPI_Request* rq) {
    Mpi1PendingRecv pr;
    pr.buf = buf;
    pr.max_bytes = count * mpi1_dtsize(dt);
    pr.tag = tag;
    pr.done = 0;
    pr.got_bytes = 0;
    mpi1_state().recvs.push_back(pr);
    *rq = (MPI_Request)mpi1_state().recvs.size();   // index + 1
    mpi1_progress();
    return MPI_SUCCESS;
}
static inline int MPI_Probe(int, int tag, MPI_Comm, MPI_Status* st) {
    Mpi1Msg* m = mpi1_find(tag);
    if (!m) mpi1_die("MPI_Probe with empty mailbox");
    if (st) { st->MPI_SOURCE = 0; st->MPI_TAG = m->tag;
              st->_bytes = (int)m->data.size(); }
    return MPI_SUCCESS;
}
static inline int MPI_Iprobe(int, int tag, MPI_Comm, int* flag,
                             MPI_Status* st) {
    Mpi1Msg* m = mpi1_find(tag);
    *flag = m != nullptr;
    if (m && st) { st->MPI_SOURCE = 0; st->MPI_TAG = m->tag;
                   st->_bytes = (int)m->data.size(); }
    return MPI_SUCCESS;
}
static inline int MPI_Get_count(const MPI_Status* st, MPI_Datatype dt,
                                int* count) {
    *count = st->_bytes / mpi1_dtsize(dt);
    return MPI_SUCCESS;
}

// ---- request completion -------------------------------------------------------
static inline int mpi1_req_done(MPI_Request rq) {
    if (rq == MPI_REQUEST_NULL) return 1;
    auto& recvs = mpi1_state().recvs;
    int idx = rq - 1;
    if (idx < 0 || idx >= (int)recvs.size()) return 1;
    return recvs[idx].done;
}
static inline int MPI_Wait(MPI_Request* rq, MPI_Status* st) {
    mpi1_progress();
    if (!mpi1_req_done(*rq)) mpi1_die("MPI_Wait on unmatched Irecv");
    if (st && *rq != MPI_REQUEST_NULL) {
        auto& pr = mpi1_state().recvs[*rq - 1];
        st->MPI_SOURCE = 0; st->MPI_TAG = pr.tag;
        st->_bytes = pr.got_bytes;
    }
    *rq = MPI_REQUEST_NULL;
    return MPI_SUCCESS;
}
static inline int MPI_Waitall(int n, MPI_Request* rqs, MPI_Status* sts) {
    for (int i = 0; i < n; i++)
        MPI_Wait(&rqs[i], sts ? &sts[i] : MPI_STATUS_IGNORE);
    return MPI_SUCCESS;
}
static inline int MPI_Test(MPI_Request* rq, int* flag, MPI_Status* st) {
    mpi1_progress();
    *flag = mpi1_req_done(*rq);
    if (*flag) MPI_Wait(rq, st);
    return MPI_SUCCESS;
}
static inline int MPI_Testall(int n, MPI_Request* rqs, int* flag,
                              MPI_Status* sts) {
    mpi1_progress();
    *flag = 1;
    for (int i = 0; i < n; i++)
        if (!mpi1_req_done(rqs[i])) { *flag = 0; return MPI_SUCCESS; }
    for (int i = 0; i < n; i++)
        MPI_Wait(&rqs[i], sts ? &sts[i] : MPI_STATUS_IGNORE);
    return MPI_SUCCESS;
}

// ---- pack / unpack --------------------------------------------------------------
static inline int MPI_Pack(const void* inbuf, int incount,
                           MPI_Datatype dt, void* outbuf, int,
                           int* position, MPI_Comm) {
    size_t n = (size_t)incount * mpi1_dtsize(dt);
    memcpy((char*)outbuf + *position, inbuf, n);
    *position += (int)n;
    return MPI_SUCCESS;
}
static inline int MPI_Unpack(const void* inbuf, int, int* position,
                             void* outbuf, int outcount, MPI_Datatype dt,
                             MPI_Comm) {
    size_t n = (size_t)outcount * mpi1_dtsize(dt);
    memcpy(outbuf, (const char*)inbuf + *position, n);
    *position += (int)n;
    return MPI_SUCCESS;
}
static inline int MPI_Pack_size(int incount, MPI_Datatype dt, MPI_Comm,
                                int* size) {
    *size = incount * mpi1_dtsize(dt);
    return MPI_SUCCESS;
}

#endif  // RAPTOR_TPU_MPI1_SHIM_H_
