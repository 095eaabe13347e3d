/* Serial single-rank MPI implementation (see mpi.h).  All traffic is
 * rank 0 -> rank 0: sends enqueue a copy, receives dequeue by tag. */
#define _XOPEN_SOURCE 700
#include "mpi.h"

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

static size_t type_size(MPI_Datatype t)
{
    switch (t) {
    case MPI_DOUBLE: return sizeof(double);
    case MPI_LONG:   return sizeof(long);
    case MPI_INT:    return sizeof(int);
    case MPI_CHAR:   return 1;
    }
    fprintf(stderr, "mpi_serial: unknown datatype %d\n", t);
    abort();
}

/* ------------------------------------------------------------------ queue */
typedef struct Msg {
    int tag;
    size_t nbytes;
    char *data;
    struct Msg *next;
} Msg;

static Msg *q_head = NULL, *q_tail = NULL;

static void q_push(const void *buf, size_t nbytes, int tag)
{
    Msg *m = malloc(sizeof(Msg));
    m->tag = tag;
    m->nbytes = nbytes;
    m->data = malloc(nbytes ? nbytes : 1);
    memcpy(m->data, buf, nbytes);
    m->next = NULL;
    if (q_tail) q_tail->next = m; else q_head = m;
    q_tail = m;
}

/* pop the first message matching tag (or the head for MPI_ANY_TAG) */
static Msg *q_pop(int tag)
{
    Msg *prev = NULL;
    for (Msg *m = q_head; m; prev = m, m = m->next) {
        if (tag == MPI_ANY_TAG || m->tag == tag) {
            if (prev) prev->next = m->next; else q_head = m->next;
            if (m == q_tail) q_tail = prev;
            return m;
        }
    }
    return NULL;
}

/* ------------------------------------------------------ pending receives */
#define MAX_PENDING 4096
typedef struct {
    void *buf;
    size_t maxbytes;
    int tag;
    int active;
} Pending;

static Pending pending[MAX_PENDING];
static int n_pending = 0;

/* --------------------------------------------------------------- basics */
int MPI_Init(int *argc, char ***argv) { (void)argc; (void)argv; return 0; }
int MPI_Finalize(void) { return 0; }
int MPI_Comm_rank(MPI_Comm c, int *rank) { (void)c; *rank = 0; return 0; }
int MPI_Comm_size(MPI_Comm c, int *size) { (void)c; *size = 1; return 0; }
int MPI_Barrier(MPI_Comm c) { (void)c; return 0; }

double MPI_Wtime(void)
{
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + 1e-9 * ts.tv_nsec;
}

/* ------------------------------------------------------- point-to-point */
int MPI_Send(const void *buf, int count, MPI_Datatype t, int dest, int tag,
             MPI_Comm comm)
{
    (void)dest; (void)comm;
    q_push(buf, (size_t)count * type_size(t), tag);
    return 0;
}

static int recv_match(void *buf, size_t maxbytes, int tag, MPI_Status *st)
{
    Msg *m = q_pop(tag);
    if (!m) {
        fprintf(stderr, "mpi_serial: Recv(tag=%d) with no matching message"
                " (deadlock on 1 rank)\n", tag);
        abort();
    }
    if (m->nbytes > maxbytes) {
        fprintf(stderr, "mpi_serial: message truncation (%zu > %zu)\n",
                m->nbytes, maxbytes);
        abort();
    }
    memcpy(buf, m->data, m->nbytes);
    if (st) {
        st->MPI_SOURCE = 0;
        st->MPI_TAG = m->tag;
        st->MPI_ERROR = 0;
        st->_nbytes = m->nbytes;
    }
    free(m->data);
    free(m);
    return 0;
}

int MPI_Recv(void *buf, int count, MPI_Datatype t, int source, int tag,
             MPI_Comm comm, MPI_Status *status)
{
    (void)source; (void)comm;
    return recv_match(buf, (size_t)count * type_size(t), tag, status);
}

int MPI_Isend(const void *buf, int count, MPI_Datatype t, int dest, int tag,
              MPI_Comm comm, MPI_Request *req)
{
    MPI_Send(buf, count, t, dest, tag, comm);
    if (req) *req = MPI_REQUEST_NULL;   /* completes immediately */
    return 0;
}

int MPI_Irecv(void *buf, int count, MPI_Datatype t, int source, int tag,
              MPI_Comm comm, MPI_Request *req)
{
    (void)source; (void)comm;
    if (n_pending >= MAX_PENDING) {
        fprintf(stderr, "mpi_serial: too many pending receives\n");
        abort();
    }
    pending[n_pending].buf = buf;
    pending[n_pending].maxbytes = (size_t)count * type_size(t);
    pending[n_pending].tag = tag;
    pending[n_pending].active = 1;
    *req = n_pending++;
    return 0;
}

int MPI_Waitall(int n, MPI_Request *reqs, MPI_Status *statuses)
{
    for (int i = 0; i < n; i++) {
        int r = reqs[i];
        /* the reference passes arrays whose center element is
         * MPI_REQUEST_NULL (or never used as a receive) — only complete
         * indices that name an ACTIVE pending receive */
        if (r < 0 || r >= n_pending || !pending[r].active)
            continue;
        recv_match(pending[r].buf, pending[r].maxbytes, pending[r].tag,
                   statuses ? &statuses[i] : NULL);
        pending[r].active = 0;
        reqs[i] = MPI_REQUEST_NULL;
    }
    /* compact the table when everything quiesced */
    int any = 0;
    for (int i = 0; i < n_pending; i++) any |= pending[i].active;
    if (!any) n_pending = 0;
    return 0;
}

int MPI_Sendrecv(const void *sendbuf, int sendcount, MPI_Datatype sendtype,
                 int dest, int sendtag, void *recvbuf, int recvcount,
                 MPI_Datatype recvtype, int source, int recvtag,
                 MPI_Comm comm, MPI_Status *status)
{
    (void)dest; (void)source; (void)comm;
    q_push(sendbuf, (size_t)sendcount * type_size(sendtype), sendtag);
    return recv_match(recvbuf, (size_t)recvcount * type_size(recvtype),
                      recvtag, status);
}

/* ----------------------------------------------------------- collectives */
int MPI_Allreduce(const void *sendbuf, void *recvbuf, int count,
                  MPI_Datatype t, MPI_Op op, MPI_Comm comm)
{
    (void)op; (void)comm;
    if (sendbuf != MPI_IN_PLACE)
        memcpy(recvbuf, sendbuf, (size_t)count * type_size(t));
    return 0;
}

int MPI_Reduce(const void *sendbuf, void *recvbuf, int count,
               MPI_Datatype t, MPI_Op op, int root, MPI_Comm comm)
{
    (void)root;
    return MPI_Allreduce(sendbuf, recvbuf, count, t, op, comm);
}

int MPI_Allgather(const void *sendbuf, int sendcount, MPI_Datatype sendtype,
                  void *recvbuf, int recvcount, MPI_Datatype recvtype,
                  MPI_Comm comm)
{
    (void)recvcount; (void)recvtype; (void)comm;
    if (sendbuf != MPI_IN_PLACE)
        memcpy(recvbuf, sendbuf, (size_t)sendcount * type_size(sendtype));
    return 0;
}

int MPI_Bcast(void *buf, int count, MPI_Datatype t, int root, MPI_Comm comm)
{
    (void)buf; (void)count; (void)t; (void)root; (void)comm;
    return 0;
}
