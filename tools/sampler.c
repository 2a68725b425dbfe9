/* Minimal LD_PRELOAD PC-sampling profiler (no perf(1) in the image).
 *
 * SIGPROF at 1 kHz records the interrupted instruction pointer; atexit
 * writes one hex PC per line to $SAMPLER_OUT (default /tmp/samples.txt).
 * tools/sampler.py resolves PCs against /proc/<pid>/maps + nm output.
 *
 * Build: gcc -O2 -shared -fPIC -o /tmp/sampler.so tools/sampler.c
 * Use:   SAMPLER_OUT=/tmp/s.txt LD_PRELOAD=/tmp/sampler.so python3 ...
 */
#define _GNU_SOURCE
#include <signal.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/time.h>
#include <ucontext.h>
#include <unistd.h>

#define MAX_SAMPLES (1 << 22)

static unsigned long *g_samples;
static volatile long g_n;

static void on_prof(int sig, siginfo_t *si, void *uc_)
{
    (void)sig; (void)si;
    ucontext_t *uc = uc_;
    long i = g_n;
    if (i < MAX_SAMPLES) {
        g_samples[i] = (unsigned long)uc->uc_mcontext.gregs[REG_RIP];
        g_n = i + 1;
    }
}

static void dump(void)
{
    const char *out = getenv("SAMPLER_OUT");
    FILE *f = fopen(out ? out : "/tmp/samples.txt", "w");
    if (!f)
        return;
    for (long i = 0; i < g_n; i++)
        fprintf(f, "%lx\n", g_samples[i]);
    fclose(f);
    /* append the memory map for symbolization */
    char path[128], buf[4096];
    const char *mapout = getenv("SAMPLER_MAPS");
    snprintf(path, sizeof(path), "/proc/%d/maps", getpid());
    FILE *m = fopen(path, "r");
    FILE *mo = fopen(mapout ? mapout : "/tmp/samples.maps", "w");
    if (m && mo) {
        size_t n;
        while ((n = fread(buf, 1, sizeof(buf), m)) > 0)
            fwrite(buf, 1, n, mo);
    }
    if (m) fclose(m);
    if (mo) fclose(mo);
}

__attribute__((constructor)) static void init(void)
{
    g_samples = malloc(MAX_SAMPLES * sizeof(unsigned long));
    if (!g_samples)
        return;
    struct sigaction sa;
    memset(&sa, 0, sizeof(sa));
    sa.sa_sigaction = on_prof;
    sa.sa_flags = SA_SIGINFO | SA_RESTART;
    sigaction(SIGPROF, &sa, NULL);
    struct itimerval it = {{0, 1000}, {0, 1000}};   /* 1 kHz CPU time */
    setitimer(ITIMER_PROF, &it, NULL);
    atexit(dump);
}
