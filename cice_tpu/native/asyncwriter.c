/* Asynchronous file writer: a small native IO runtime that lets the model
 * loop hand off history/restart payloads and return to compute immediately.
 *
 * TPU-native analogue of the latency-hiding role of the reference's parallel
 * IO backend (io_pio2: decomposition-aware writes off the critical path,
 * cicecore/cicedyn/infrastructure/io/io_pio2/ice_pio.F90:591): here the
 * "decomposition" is host-side byte payloads produced per device shard or per
 * gathered field, and the overlap comes from a pthread worker pool draining a
 * FIFO while XLA keeps the chip busy.
 *
 * Exported (ctypes) API:
 *   void *cice_aw_start(int nthreads);
 *   int   cice_aw_submit(void *h, const char *path, const void *data, size_t n);
 *   long  cice_aw_flush(void *h);      -- block until drained; cumulative errors
 *   long  cice_aw_pending(void *h);    -- queued + in-flight jobs
 *   void  cice_aw_stop(void *h);       -- flush, join, free
 *
 * Submit copies the payload, so callers may free/reuse their buffer at once.
 * Writes go to <path>.tmp then rename(2), so readers (restart pointer chase,
 * BFB comparisons) never observe a partial file.
 */

#include <pthread.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef struct aw_job {
    char *path;
    unsigned char *data;
    size_t n;
    struct aw_job *next;
} aw_job;

typedef struct {
    pthread_mutex_t mu;
    pthread_cond_t cv_push;   /* signalled when a job is queued or stop set */
    pthread_cond_t cv_done;   /* signalled when a worker finishes a job     */
    aw_job *head, *tail;
    long queued;              /* jobs in FIFO                               */
    long inflight;            /* jobs popped but not yet written            */
    long errors;              /* cumulative failed writes                   */
    int stop;
    int nthreads;
    pthread_t *threads;
} aw_ctx;

static int aw_write_file(const char *path, const unsigned char *data, size_t n)
{
    size_t plen = strlen(path);
    char *tmp = (char *)malloc(plen + 5);
    if (!tmp) return -1;
    memcpy(tmp, path, plen);
    memcpy(tmp + plen, ".tmp", 5);

    FILE *f = fopen(tmp, "wb");
    if (!f) { free(tmp); return -1; }
    int ok = (n == 0) || (fwrite(data, 1, n, f) == n);
    ok = (fclose(f) == 0) && ok;
    if (ok)
        ok = (rename(tmp, path) == 0);
    else
        remove(tmp);
    free(tmp);
    return ok ? 0 : -1;
}

static void *aw_worker(void *arg)
{
    aw_ctx *c = (aw_ctx *)arg;
    for (;;) {
        pthread_mutex_lock(&c->mu);
        while (!c->head && !c->stop)
            pthread_cond_wait(&c->cv_push, &c->mu);
        if (!c->head && c->stop) {
            pthread_mutex_unlock(&c->mu);
            return NULL;
        }
        aw_job *j = c->head;
        c->head = j->next;
        if (!c->head) c->tail = NULL;
        c->queued--;
        c->inflight++;
        pthread_mutex_unlock(&c->mu);

        int rc = aw_write_file(j->path, j->data, j->n);

        pthread_mutex_lock(&c->mu);
        c->inflight--;
        if (rc != 0) c->errors++;
        pthread_cond_broadcast(&c->cv_done);
        pthread_mutex_unlock(&c->mu);

        free(j->path);
        free(j->data);
        free(j);
    }
}

void *cice_aw_start(int nthreads)
{
    if (nthreads < 1) nthreads = 1;
    if (nthreads > 64) nthreads = 64;
    aw_ctx *c = (aw_ctx *)calloc(1, sizeof(aw_ctx));
    if (!c) return NULL;
    pthread_mutex_init(&c->mu, NULL);
    pthread_cond_init(&c->cv_push, NULL);
    pthread_cond_init(&c->cv_done, NULL);
    c->threads = (pthread_t *)calloc((size_t)nthreads, sizeof(pthread_t));
    if (!c->threads) { free(c); return NULL; }
    c->nthreads = nthreads;
    for (int i = 0; i < nthreads; i++) {
        if (pthread_create(&c->threads[i], NULL, aw_worker, c) != 0) {
            c->nthreads = i;
            break;
        }
    }
    if (c->nthreads == 0) {
        free(c->threads);
        free(c);
        return NULL;
    }
    return c;
}

int cice_aw_submit(void *h, const char *path, const void *data, size_t n)
{
    aw_ctx *c = (aw_ctx *)h;
    if (!c || c->stop) return -1;
    aw_job *j = (aw_job *)malloc(sizeof(aw_job));
    if (!j) return -1;
    j->path = strdup(path);
    j->data = (unsigned char *)malloc(n ? n : 1);
    j->n = n;
    j->next = NULL;
    if (!j->path || !j->data) {
        free(j->path);
        free(j->data);
        free(j);
        return -1;
    }
    if (n) memcpy(j->data, data, n);

    pthread_mutex_lock(&c->mu);
    if (c->tail) c->tail->next = j; else c->head = j;
    c->tail = j;
    c->queued++;
    pthread_cond_signal(&c->cv_push);
    pthread_mutex_unlock(&c->mu);
    return 0;
}

long cice_aw_flush(void *h)
{
    aw_ctx *c = (aw_ctx *)h;
    if (!c) return -1;
    pthread_mutex_lock(&c->mu);
    while (c->queued > 0 || c->inflight > 0)
        pthread_cond_wait(&c->cv_done, &c->mu);
    long errs = c->errors;
    pthread_mutex_unlock(&c->mu);
    return errs;
}

long cice_aw_pending(void *h)
{
    aw_ctx *c = (aw_ctx *)h;
    if (!c) return -1;
    pthread_mutex_lock(&c->mu);
    long n = c->queued + c->inflight;
    pthread_mutex_unlock(&c->mu);
    return n;
}

void cice_aw_stop(void *h)
{
    aw_ctx *c = (aw_ctx *)h;
    if (!c) return;
    cice_aw_flush(c);
    pthread_mutex_lock(&c->mu);
    c->stop = 1;
    pthread_cond_broadcast(&c->cv_push);
    pthread_mutex_unlock(&c->mu);
    for (int i = 0; i < c->nthreads; i++)
        pthread_join(c->threads[i], NULL);
    free(c->threads);
    pthread_mutex_destroy(&c->mu);
    pthread_cond_destroy(&c->cv_push);
    pthread_cond_destroy(&c->cv_done);
    free(c);
}
