// Kjarni — C# binding over the kjarni C ABI (libkjarni.so / kjarni.dll).
//
// Rebuild of kjarni-ffi/bindings/csharp: the same NuGet-style surface as
// IDisposable wrappers over native handles — all ten tasks (Classifier,
// Embedder, Reranker, Chat, Generator, Summarizer, Translator, Transcriber,
// Indexer, Searcher) plus CancelToken streaming (callback.rs:52).
//
// Build (no .NET toolchain in this image; run where dotnet exists):
//   dotnet build bindings/csharp/Kjarni/Kjarni.csproj
//   LD_LIBRARY_PATH=$REPO/native dotnet test bindings/csharp/Kjarni.Tests

using System;
using System.Collections.Generic;
using System.Runtime.InteropServices;
using System.Text.Json;

namespace Kjarni
{
    internal static class Native
    {
        private const string Lib = "kjarni";

        [DllImport(Lib)] internal static extern int kjarni_init();
        [DllImport(Lib)] internal static extern IntPtr kjarni_version();
        [DllImport(Lib)] internal static extern IntPtr kjarni_last_error();
        [DllImport(Lib)] internal static extern long kjarni_new(string task, string jsonOptions);
        [DllImport(Lib)] internal static extern void kjarni_free(long handle);
        [DllImport(Lib)] internal static extern IntPtr kjarni_call(long handle, string method, string jsonArgs);
        [DllImport(Lib)] internal static extern void kjarni_string_free(IntPtr s);
        [DllImport(Lib)] internal static extern int kjarni_stream_start(long handle, string method, string jsonArgs);
        [DllImport(Lib)] internal static extern int kjarni_stream_start_cancellable(long handle, string method, string jsonArgs, long cancelToken);
        [DllImport(Lib)] internal static extern IntPtr kjarni_stream_next(long handle);
        [DllImport(Lib)] internal static extern void kjarni_stream_cancel(long handle);
        [DllImport(Lib)] internal static extern long kjarni_cancel_token_new();
        [DllImport(Lib)] internal static extern void kjarni_cancel_token_cancel(long token);
        [DllImport(Lib)] internal static extern int kjarni_cancel_token_is_cancelled(long token);
        [DllImport(Lib)] internal static extern void kjarni_cancel_token_free(long token);

        static Native()
        {
            if (kjarni_init() != 0)
                throw new KjarniException(LastError());
        }

        internal static string LastError() =>
            Marshal.PtrToStringUTF8(kjarni_last_error()) ?? "unknown error";

        internal static string TakeString(IntPtr p)
        {
            if (p == IntPtr.Zero) throw new KjarniException(LastError());
            var s = Marshal.PtrToStringUTF8(p) ?? "";
            kjarni_string_free(p);
            return s;
        }
    }

    public class KjarniException : Exception
    {
        public KjarniException(string message) : base(message) { }
    }

    /// <summary>Library-level metadata (cf. Go binding's Version()).</summary>
    public static class KjarniLib
    {
        public static string Version =>
            Marshal.PtrToStringUTF8(Native.kjarni_version()) ?? "";
    }

    public abstract class KjarniObject : IDisposable
    {
        private protected long Handle;

        private protected KjarniObject(string task, string? model)
        {
            var opts = model == null ? "{}" :
                JsonSerializer.Serialize(new Dictionary<string, string> { ["model"] = model });
            Handle = Native.kjarni_new(task, opts);
            if (Handle == 0) throw new KjarniException(Native.LastError());
        }

        private protected JsonElement Call(string method, object args)
        {
            var json = JsonSerializer.Serialize(args);
            var result = Native.TakeString(Native.kjarni_call(Handle, method, json));
            return JsonDocument.Parse(result).RootElement;
        }

        public void Dispose()
        {
            if (Handle != 0)
            {
                Native.kjarni_free(Handle);
                Handle = 0;
            }
            GC.SuppressFinalize(this);
        }

        ~KjarniObject() => Dispose();
    }

    public record LabelScore(string Label, double Score);

    public record ClassificationResult(string Label, double Score, List<LabelScore> AllScores)
    {
        public override string ToString() => $"{Label} ({Score * 100:F1}%)";

        public string ToDetailedString()
        {
            var lines = new List<string>();
            foreach (var s in AllScores)
                lines.Add($"  {s.Label}: {s.Score * 100:F1}%");
            return string.Join("\n", lines);
        }
    }

    /// <summary>Cancellable-from-any-thread token for streaming generation
    /// (cf. kjarni-ffi callback.rs:52 CancellationToken).</summary>
    public sealed class CancelToken : IDisposable
    {
        internal long Handle;

        public CancelToken()
        {
            Handle = Native.kjarni_cancel_token_new();
            if (Handle == 0) throw new KjarniException(Native.LastError());
        }

        public void Cancel() => Native.kjarni_cancel_token_cancel(Handle);
        public bool IsCancelled => Native.kjarni_cancel_token_is_cancelled(Handle) != 0;

        public void Dispose()
        {
            if (Handle != 0)
            {
                Native.kjarni_cancel_token_free(Handle);
                Handle = 0;
            }
            GC.SuppressFinalize(this);
        }

        ~CancelToken() => Dispose();
    }

    public sealed class Classifier : KjarniObject
    {
        public Classifier(string model = "distilbert-sentiment") : base("classifier", model) { }

        private static ClassificationResult Parse(JsonElement r)
        {
            var all = new List<LabelScore>();
            foreach (var pair in r.GetProperty("all_scores").EnumerateArray())
                all.Add(new LabelScore(pair[0].GetString()!, pair[1].GetDouble()));
            return new ClassificationResult(
                r.GetProperty("label").GetString()!,
                r.GetProperty("score").GetDouble(), all);
        }

        public ClassificationResult Classify(string text) =>
            Parse(Call("classify", new { text }));

        public List<ClassificationResult> ClassifyBatch(string[] texts)
        {
            var r = Call("classify_batch", new { texts });
            var results = new List<ClassificationResult>();
            foreach (var item in r.GetProperty("results").EnumerateArray())
                results.Add(Parse(item));
            return results;
        }

        public List<string> Labels()
        {
            var r = Call("labels", new { });
            var labels = new List<string>();
            foreach (var l in r.GetProperty("labels").EnumerateArray())
                labels.Add(l.GetString()!);
            return labels;
        }
    }

    public sealed class Embedder : KjarniObject
    {
        public Embedder(string model = "minilm-l6-v2") : base("embedder", model) { }

        public float[] Encode(string text)
        {
            var r = Call("embed", new { text });
            var vec = r.GetProperty("embedding");
            var outArr = new float[vec.GetArrayLength()];
            int i = 0;
            foreach (var v in vec.EnumerateArray()) outArr[i++] = (float)v.GetDouble();
            return outArr;
        }

        public double Similarity(string a, string b) =>
            Call("similarity", new { a, b }).GetProperty("similarity").GetDouble();

        public List<float[]> EncodeBatch(string[] texts)
        {
            var r = Call("embed_batch", new { texts });
            var vecs = new List<float[]>();
            foreach (var row in r.GetProperty("embeddings").EnumerateArray())
            {
                var vec = new float[row.GetArrayLength()];
                int i = 0;
                foreach (var v in row.EnumerateArray()) vec[i++] = (float)v.GetDouble();
                vecs.Add(vec);
            }
            return vecs;
        }

        public int Dim => Call("dim", new { }).GetProperty("dim").GetInt32();
    }

    public sealed class Reranker : KjarniObject
    {
        public Reranker(string model = "minilm-l6-v2-cross-encoder") : base("reranker", model) { }

        public List<(int Index, double Score, string Text)> Rerank(string query, string[] documents)
        {
            var r = Call("rerank", new { query, documents });
            var results = new List<(int, double, string)>();
            foreach (var item in r.GetProperty("results").EnumerateArray())
                results.Add((item.GetProperty("index").GetInt32(),
                             item.GetProperty("score").GetDouble(),
                             item.GetProperty("text").GetString()!));
            return results;
        }

        public double Score(string query, string document) =>
            Call("score", new { query, document }).GetProperty("score").GetDouble();

        public List<(int Index, double Score, string Text)> RerankTopK(
            string query, string[] documents, int k)
        {
            var all = Rerank(query, documents);
            return all.Count > k ? all.GetRange(0, k) : all;
        }
    }

    public sealed class Chat : KjarniObject
    {
        public Chat(string model = "qwen2.5-0.5b-instruct") : base("chat", model) { }

        public string Send(string message) =>
            Call("send", new { message }).GetProperty("reply").GetString()!;

        public void ClearHistory() => Call("clear_history", new { keep_system = true });

        public IEnumerable<string> Stream(string message, CancelToken? cancel = null)
        {
            var json = JsonSerializer.Serialize(new { message });
            return KjarniStream.Pull(Handle, "stream", json, cancel);
        }
    }

    internal static class KjarniStream
    {
        internal static IEnumerable<string> Pull(long handle, string method,
                                                 string jsonArgs, CancelToken? cancel)
        {
            var tok = cancel?.Handle ?? 0;
            if (Native.kjarni_stream_start_cancellable(handle, method, jsonArgs, tok) != 0)
                throw new KjarniException(Native.LastError());
            while (true)
            {
                var p = Native.kjarni_stream_next(handle);
                if (p == IntPtr.Zero) yield break;
                yield return Native.TakeString(p);
            }
        }
    }

    public sealed class Generator : KjarniObject
    {
        public Generator(string model = "qwen2.5-0.5b-instruct") : base("generator", model) { }

        public string Generate(string prompt, int maxNewTokens = 0)
        {
            var r = maxNewTokens > 0
                ? Call("generate", new { prompt, max_new_tokens = maxNewTokens })
                : Call("generate", new { prompt });
            return r.GetProperty("text").GetString()!;
        }

        public IEnumerable<string> GenerateStream(string prompt, CancelToken? cancel = null)
        {
            var json = JsonSerializer.Serialize(new { prompt });
            return KjarniStream.Pull(Handle, "generate_stream", json, cancel);
        }
    }

    public sealed class Summarizer : KjarniObject
    {
        public Summarizer(string model = "distilbart-cnn") : base("summarizer", model) { }

        public string Summarize(string text) =>
            Call("summarize", new { text }).GetProperty("summary").GetString()!;
    }

    public sealed class Translator : KjarniObject
    {
        public Translator(string model = "flan-t5-base") : base("translator", model) { }

        public string Translate(string text, string from, string to)
        {
            var args = new Dictionary<string, string>
            {
                ["text"] = text, ["from"] = from, ["to"] = to
            };
            return Call("translate", args).GetProperty("translation").GetString()!;
        }
    }

    public record TranscriptSegment(double Start, double End, string Text);

    public record Transcript(string Text, double Duration, List<TranscriptSegment> Segments);

    public sealed class Transcriber : KjarniObject
    {
        public Transcriber(string model = "whisper-small") : base("transcriber", model) { }

        public Transcript TranscribeFile(string path)
        {
            var r = Call("transcribe_file", new { path });
            var segs = new List<TranscriptSegment>();
            foreach (var s in r.GetProperty("segments").EnumerateArray())
                segs.Add(new TranscriptSegment(
                    s.GetProperty("start").GetDouble(),
                    s.GetProperty("end").GetDouble(),
                    s.GetProperty("text").GetString()!));
            return new Transcript(
                r.GetProperty("text").GetString()!,
                r.GetProperty("duration").GetDouble(), segs);
        }
    }

    public enum SearchMode { Keyword, Semantic, Hybrid }

    public sealed class Indexer : KjarniObject
    {
        public Indexer(string model = "minilm-l6-v2", bool quiet = false) : base("indexer", model) { }

        public void Create(string indexPath, string[] paths) =>
            Call("create", new { index_path = indexPath, paths });

        public void Add(string indexPath, string[] paths) =>
            Call("add", new { index_path = indexPath, paths });
    }

    public sealed class Searcher : KjarniObject
    {
        public Searcher(string model = "minilm-l6-v2", string? rerankerModel = null)
            : base("searcher", model) { }

        public List<(double Score, string Text)> Search(
            string indexPath, string query, SearchMode mode = SearchMode.Hybrid, int topK = 10)
        {
            var r = Call("search", new
            {
                index_path = indexPath,
                query,
                mode = mode.ToString().ToLowerInvariant(),
                top_k = topK
            });
            var results = new List<(double, string)>();
            foreach (var item in r.GetProperty("results").EnumerateArray())
                results.Add((item.GetProperty("score").GetDouble(),
                             item.GetProperty("text").GetString()!));
            return results;
        }
    }
}
