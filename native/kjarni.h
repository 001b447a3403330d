/* kjarni C ABI — public header (cf. kjarni-ffi/dist/include/kjarni.h).
 *
 * Handle-based API: create task objects, call methods with JSON in/out, free.
 * All functions are thread-safe; errors are reported per-thread via
 * kjarni_last_error().
 */

#ifndef KJARNI_H
#define KJARNI_H

#ifdef __cplusplus
extern "C" {
#endif

/* lifecycle */
int kjarni_init(void);
void kjarni_shutdown(void);
const char* kjarni_version(void);
const char* kjarni_last_error(void);

/* generic object model: task in {"embedder","classifier","reranker","chat",
 * "generator","summarizer","translator","transcriber","indexer","searcher"} */
long long kjarni_new(const char* task, const char* json_options);
void kjarni_free(long long handle);
char* kjarni_call(long long handle, const char* method, const char* json_args);
void kjarni_string_free(char* s);

/* pull-based token streaming (chat/generator) */
int kjarni_stream_start(long long handle, const char* method,
                        const char* json_args);
/* same, with a cancel token the engine checks each decode step (0 = none) */
int kjarni_stream_start_cancellable(long long handle, const char* method,
                                    const char* json_args,
                                    long long cancel_token);
char* kjarni_stream_next(long long handle);   /* null at end of stream */
void kjarni_stream_cancel(long long handle);

/* cancel tokens (cf. kjarni-ffi callback.rs:52): cancellable from any
 * thread; pass to kjarni_stream_with_callback (0 = none) */
long long kjarni_cancel_token_new(void);
void kjarni_cancel_token_cancel(long long token);
int kjarni_cancel_token_is_cancelled(long long token);
void kjarni_cancel_token_free(long long token);

/* push-based token streaming (cf. kjarni-ffi callback.rs:86): the callback
 * receives each token; return 0 to continue, nonzero to stop. Returns the
 * number of tokens delivered, or -1 on error. The callback runs WITHOUT the
 * Python GIL held, so it may block or call back into kjarni. */
typedef int (*kjarni_token_callback)(const char* token, void* user_data);
int kjarni_stream_with_callback(long long handle, const char* method,
                                const char* json_args,
                                kjarni_token_callback callback,
                                void* user_data, long long cancel_token);

/* typed conveniences */
long long kjarni_embedder_new(const char* model);
long long kjarni_classifier_new(const char* model);
long long kjarni_reranker_new(const char* model);
long long kjarni_chat_new(const char* model);
long long kjarni_indexer_new(const char* model);
long long kjarni_searcher_new(const char* model);

int kjarni_embedder_embed(long long h, const char* text, float* out,
                          int out_capacity);
float kjarni_embedder_similarity(long long h, const char* a, const char* b);
char* kjarni_classifier_classify(long long h, const char* text);
char* kjarni_chat_send(long long h, const char* message);

#ifdef __cplusplus
}
#endif

#endif /* KJARNI_H */
